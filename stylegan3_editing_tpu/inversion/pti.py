"""PTI — pivotal tuning inversion: fine-tune the generator around a pivot.

Parity: reference inversion/scripts/run_pti_images.py (Adam 3e-4 over
synthesis params minus the Fourier-feature input, LPIPS+L2, 350 steps, LPIPS
early stop at 0.06, optional landmarks transform) and
inversion/video/run_pti_video.py (one generator tuned over all frames).

TPU-first re-design:
- The reference tunes a fresh generator per image in sequence
  (run_pti_images.py:86-99); here `optimize_batch` carries **per-image
  weight copies** (a stacked params pytree) through a vmapped update — all
  images tune in parallel on one chip.
- Early stop is a per-image freeze mask inside the jitted step (converged
  images stop receiving updates), with a host-side all-converged break.
- Video mode (`optimize_shared`) tunes ONE weight set over frame batches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..criteria.lpips import LPIPS
from ..models.sg3.config import SG3Config
from ..models.sg3.generator import Generator


@dataclasses.dataclass
class PTIOptions:
    learning_rate: float = 3e-4
    lpips_lambda: float = 1.0
    l2_lambda: float = 1.0
    steps: int = 350
    lpips_threshold: float = 0.06
    check_every: int = 10  # host-side all-converged check cadence


def _split_trainable(synthesis_params: dict) -> Tuple[dict, dict]:
    """Trainable = synthesis params minus the Fourier-feature input stage
    (reference excludes generator.synthesis.parameters()[3:], i.e. the
    `input` submodule, run_pti_images.py:111-114)."""
    trainable = {k: v for k, v in synthesis_params.items() if k != "input"}
    frozen = {k: v for k, v in synthesis_params.items() if k == "input"}
    return trainable, frozen


class PTI:
    """Pivotal tuning over a converted/loaded generator."""

    def __init__(self, cfg: SG3Config, variables: dict,
                 lpips_variables: Optional[dict] = None,
                 opts: Optional[PTIOptions] = None,
                 mesh=None, spatial_axis: str = "space",
                 spatial_axis_w: Optional[str] = None):
        self.cfg = cfg
        self.opts = opts or PTIOptions()
        self.model = Generator(cfg)
        self.variables = variables
        self.lpips = LPIPS(net_type="alex")
        if lpips_variables is None:
            x0 = jnp.zeros((1, 64, 64, 3))
            lpips_variables = self.lpips.init(jax.random.PRNGKey(0), x0, x0)
        self.lpips_variables = lpips_variables
        self.tx = optax.adam(self.opts.learning_rate)
        # Spatial sharding (parallel/spatial.py): with a mesh, the SHARED
        # (video) tuning mode runs its forward+backward H[/W]-sharded —
        # canvases past one chip's HBM become tunable (halo-exchange grads
        # are exact, tests/test_parallel.py::
        # test_spatial_synthesis_gradients_match_unsharded).
        self.mesh = mesh
        self.spatial_axis = spatial_axis
        self.spatial_axis_w = spatial_axis_w

    # ------------------------------------------------------------ internals

    def _apply_with(self, synthesis_params, codes, transform):
        variables = dict(self.variables)
        variables["params"] = {**self.variables["params"],
                               "synthesis": synthesis_params}
        # Reference PTI forces fp32 (run_pti_images.py:130-143) to dodge
        # fp16 range issues; bf16 has the fp32 exponent so the guard is
        # unnecessary on TPU — and ≥1024² fp32 grad graphs exceed HBM
        # (~30 GB: seven ~2.9 GB up-grid temps in L10's backward alone).
        # Full fp32 stays the default below the flagship resolution.
        force_fp32 = self.cfg.img_resolution < 1024
        if self.mesh is not None:
            from ..parallel.spatial import spatial_synthesis

            return spatial_synthesis(
                self.cfg, variables, codes, self.mesh,
                axis=self.spatial_axis, axis_w=self.spatial_axis_w,
                transform=transform, force_fp32=force_fp32)
        return self.model.apply(variables, codes, transform=transform,
                                force_fp32=force_fp32,
                                method=self.model.synthesize)

    def _losses(self, outputs, targets):
        l2 = jnp.mean(jnp.square(outputs - targets))
        lp = self.lpips.apply(self.lpips_variables, outputs, targets)
        loss = self.opts.l2_lambda * l2 + self.opts.lpips_lambda * lp
        return loss, l2, lp

    # ------------------------------------------------------- batched images

    def optimize_batch(self, codes: jax.Array, targets: jax.Array,
                       transforms: Optional[jax.Array] = None,
                       steps: Optional[int] = None):
        """Per-image pivotal tuning, vmapped across the batch.

        codes: [N, num_ws, w_dim]; targets: [N, H, W, 3] in [-1, 1];
        transforms: [N, 3, 3] or None. Returns (stacked per-image synthesis
        params, final images, metrics dict).
        """
        opts = self.opts
        steps = steps or opts.steps
        assert self.mesh is None, (
            "spatial PTI runs in the shared-weights mode (optimize_shared); "
            "the per-image vmapped mode doesn't compose with shard_map")
        n = codes.shape[0]
        base = self.variables["params"]["synthesis"]
        trainable, frozen = _split_trainable(base)
        stacked = jax.tree_util.tree_map(
            lambda p: jnp.broadcast_to(p[None], (n,) + p.shape), trainable)
        opt_state = jax.vmap(self.tx.init)(stacked)
        if transforms is None:
            transforms = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))

        def one_image_loss(train_p, code, target, transform):
            params = {**frozen, **train_p}
            out = self._apply_with(params, code[None], transform[None])
            loss, l2, lp = self._losses(out, target[None])
            return loss, (l2, lp, out[0])

        grad_fn = jax.value_and_grad(one_image_loss, has_aux=True)

        @jax.jit
        def step_fn(stacked, opt_state, active):
            def update_one(train_p, opt_s, code, target, transform, active_i):
                (loss, (l2, lp, img)), grads = grad_fn(train_p, code, target,
                                                       transform)
                grads = jax.tree_util.tree_map(
                    lambda g: g * active_i.astype(g.dtype), grads)
                updates, opt_s = self.tx.update(grads, opt_s, train_p)
                train_p = optax.apply_updates(train_p, updates)
                return train_p, opt_s, loss, l2, lp, img

            stacked, opt_state, loss, l2, lp, imgs = jax.vmap(update_one)(
                stacked, opt_state, codes, targets, transforms, active)
            active = jnp.logical_and(active, lp >= opts.lpips_threshold)
            return stacked, opt_state, active, loss, l2, lp, imgs

        active = jnp.ones((n,), bool)
        for step in range(steps):
            stacked, opt_state, active, loss, l2, lp, _ = step_fn(
                stacked, opt_state, active)
            if step % opts.check_every == 0 and not bool(jnp.any(active)):
                break

        # Final render with the FINAL weights (the in-loop images lag the
        # last update by one step).
        @jax.jit
        def final_render(stacked):
            def render_one(train_p, code, target, transform):
                out = self._apply_with({**frozen, **train_p}, code[None],
                                       transform[None])
                loss, l2, lp = self._losses(out, target[None])
                return out[0], loss, l2, lp
            return jax.vmap(render_one)(stacked, codes, targets, transforms)

        imgs, loss, l2, lp = final_render(stacked)
        metrics = {"loss": np.asarray(loss), "l2": np.asarray(l2),
                   "lpips": np.asarray(lp),
                   "converged": ~np.asarray(active)}
        return stacked, imgs, metrics

    # ------------------------------------------------------- shared (video)

    def optimize_shared(self, batches, steps: Optional[int] = None,
                        batch_size: int = 4):
        """One generator tuned over all frames (video PTI).

        `batches`: iterable (restartable callable) yielding
        (codes, targets, transforms-or-None). Returns (synthesis params,
        metrics history).
        """
        opts = self.opts
        steps = steps or opts.steps
        base = self.variables["params"]["synthesis"]
        trainable, frozen = _split_trainable(base)
        opt_state = self.tx.init(trainable)

        def loss_fn(train_p, codes, targets, transforms):
            params = {**frozen, **train_p}
            out = self._apply_with(params, codes, transforms)
            loss, l2, lp = self._losses(out, targets)
            return loss, (l2, lp)

        @jax.jit
        def step_fn(train_p, opt_state, codes, targets, transforms):
            (loss, (l2, lp)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train_p, codes, targets, transforms)
            updates, opt_state = self.tx.update(grads, opt_state, train_p)
            return optax.apply_updates(train_p, updates), opt_state, loss, l2, lp

        history = []
        step = 0
        while step < steps:
            for codes, targets, transforms in batches():
                if transforms is None:
                    transforms = jnp.broadcast_to(jnp.eye(3),
                                                  (codes.shape[0], 3, 3))
                trainable, opt_state, loss, l2, lp = step_fn(
                    trainable, opt_state, jnp.asarray(codes),
                    jnp.asarray(targets), jnp.asarray(transforms))
                history.append({"step": step, "loss": float(loss),
                                "l2": float(l2), "lpips": float(lp)})
                step += 1
                if step >= steps:
                    break
        return trainable, history

    def tuned_variables(self, synthesis_params: dict) -> dict:
        """Full variables tree with tuned synthesis params installed."""
        frozen = {k: v for k, v in
                  self.variables["params"]["synthesis"].items() if k == "input"}
        variables = dict(self.variables)
        variables["params"] = {**self.variables["params"],
                               "synthesis": {**frozen, **synthesis_params}}
        return variables
