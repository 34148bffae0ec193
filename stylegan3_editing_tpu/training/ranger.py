"""Ranger optimizer (RAdam + Lookahead + gradient centralization) for optax.

Semantics parity: reference utils/ranger.py — the default encoder optimizer
(train_options.py:41 `optim_name='ranger'`): gradient centralization on
params with ndim > 1, RAdam with N_sma_threshold=5, Lookahead with k=6,
alpha=0.5. Composed from optax primitives + a self-contained lookahead
wrapper (slow weights live in the optimizer state, so the training loop
stays a plain optax loop).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def centralize_gradients() -> optax.GradientTransformation:
    """Subtract the per-slice mean from gradients of rank > 1 params."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def center(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(center, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    step: jnp.ndarray


def with_lookahead(inner: optax.GradientTransformation, k: int = 6,
                   alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead: every k fast steps, pull slow weights toward fast and snap."""

    def init_fn(params):
        return LookaheadState(inner=inner.init(params),
                              slow=jax.tree_util.tree_map(jnp.copy, params),
                              step=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        u, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, u)
        step = state.step + 1
        sync = (step % k) == 0

        def synced(args):
            fast, slow = args
            new_slow = jax.tree_util.tree_map(
                lambda s, f: s + alpha * (f - s), slow, fast)
            return new_slow, new_slow

        def not_synced(args):
            fast, slow = args
            return fast, slow

        new_params, new_slow = jax.lax.cond(sync, synced, not_synced,
                                            (fast, state.slow))
        final_updates = jax.tree_util.tree_map(lambda n, p: n - p, new_params,
                                               params)
        return final_updates, LookaheadState(inner_state, new_slow, step)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(
    learning_rate: float = 1e-3,
    alpha: float = 0.5,
    k: int = 6,
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    weight_decay: float = 0.0,
    n_sma_threshold: float = 5.0,
    use_gc: bool = True,
) -> optax.GradientTransformation:
    """The full Ranger transform (reference defaults)."""
    chain = []
    if use_gc:
        chain.append(centralize_gradients())
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.radam(learning_rate, b1=b1, b2=b2, eps=eps,
                             threshold=n_sma_threshold))
    return with_lookahead(optax.chain(*chain), k=k, alpha=alpha)
