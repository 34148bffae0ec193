"""ReStyle pSp / e4e coach: the full encoder training loop, jit-compiled.

Parity targets: inversion/training/coach_restyle_psp.py (ReStyle iteration
step :91-112, grad accumulation :128-130, validation + best checkpoint
:140-205) and coach_restyle_e4e.py (latent discriminator :340-349, :462-494,
delta regularization :351-362, progressive stages :431-436, W-pool :506-519).

TPU-first re-design:
- One jitted train step runs ALL ReStyle iterations and sums their losses
  (grad of the sum ≡ the reference's per-iteration backward accumulation,
  since weights are fixed within a batch).
- Gradient accumulation via optax.MultiSteps (effective batch 8).
- The latent discriminator trains in its own jitted steps; the W replay pool
  is host-side numpy between steps, exactly its role in the reference loop.
- The decoder stays frozen (train_decoder=False default) and bf16-capable;
  frozen loss nets (LPIPS/ID/MoCo) are closure constants of the step.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..criteria import IDLoss, LPIPS, MocoLoss, w_norm_loss
from ..models.encoders import RestyleNet
from ..models.encoders.backbones import INFERENCE_STAGE
from ..models.sg3 import SG3Config, sg3_r_config
from ..runtime.checkpoint import load_pytree, opts_to_dict, save_pytree
from ..runtime.training_stats import StatsCollector
from .latent_discriminator import LatentCodesDiscriminator, LatentCodesPool
from .options import E4eTrainOptions, TrainOptions
from .ranger import ranger


def _make_optimizer(opts: TrainOptions) -> optax.GradientTransformation:
    if opts.optim_name == "ranger":
        tx = ranger(opts.learning_rate)
    else:
        tx = optax.adam(opts.learning_rate)
    accum = max(int(opts.effective_batch_size / opts.batch_size), 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


class Coach:
    """Trains a ReStyle encoder against a frozen alias-free decoder."""

    def __init__(
        self,
        opts: TrainOptions,
        decoder_cfg: Optional[SG3Config] = None,
        decoder_variables: Optional[dict] = None,
        loss_variables: Optional[Dict[str, dict]] = None,
        rng: Optional[jax.Array] = None,
    ):
        self.opts = opts
        self.is_e4e = isinstance(opts, E4eTrainOptions)
        self.global_step = 0
        self.best_val_loss: Optional[float] = None
        self.stats = StatsCollector()

        rng = rng if rng is not None else jax.random.PRNGKey(opts.seed)
        self.decoder_cfg = decoder_cfg or sg3_r_config(opts.output_size)
        self.n_styles = self.decoder_cfg.num_ws
        self.model = RestyleNet(
            decoder_cfg=self.decoder_cfg,
            encoder_type=opts.encoder_type,
            n_styles=self.n_styles,
            input_nc=opts.input_nc,
        )

        dummy = jnp.zeros((1, 256, 256, opts.input_nc), jnp.float32)
        self.variables = jax.jit(self.model.init)(
            rng, dummy, latent_avg=jnp.zeros((self.decoder_cfg.w_dim,)))
        self.variables = jax.device_get(self.variables)
        self.variables = jax.tree_util.tree_map(jnp.asarray, self.variables)
        if decoder_variables is not None:
            self._graft_decoder(decoder_variables)

        self.latent_avg = self.variables["ema"]["decoder"]["mapping"]["w_avg"]
        self.avg_image = self._compute_avg_image()

        # Loss networks (frozen). Variables injected (converted pretrained
        # weights) or randomly initialized.
        loss_variables = loss_variables or {}
        self.loss_nets: Dict[str, Tuple[Any, dict]] = {}
        x0 = jnp.zeros((1, 256, 256, 3))
        if opts.lpips_lambda > 0:
            net = LPIPS(net_type="alex")
            v = loss_variables.get("lpips") or net.init(jax.random.PRNGKey(1),
                                                        x0, x0)
            self.loss_nets["lpips"] = (net, v)
        if opts.id_lambda > 0:
            net = IDLoss()
            v = loss_variables.get("id") or net.init(jax.random.PRNGKey(2),
                                                     x0, x0, x0)
            self.loss_nets["id"] = (net, v)
        if opts.moco_lambda > 0:
            net = MocoLoss()
            v = loss_variables.get("moco") or net.init(jax.random.PRNGKey(3),
                                                       x0, x0, x0)
            self.loss_nets["moco"] = (net, v)

        # Optimizer over the trainable subtree.
        self.tx = _make_optimizer(opts)
        self.opt_state = self.tx.init(self._trainable(self.variables["params"]))

        # e4e latent discriminator.
        self.disc = None
        if self.is_e4e and opts.w_discriminator_lambda > 0:
            self.disc = LatentCodesDiscriminator(self.decoder_cfg.w_dim, 4)
            self.disc_variables = self.disc.init(
                jax.random.PRNGKey(4), jnp.zeros((1, self.decoder_cfg.w_dim)))
            self.disc_tx = optax.adam(opts.w_discriminator_lr)
            self.disc_opt_state = self.disc_tx.init(self.disc_variables["params"])
            self.real_w_pool = LatentCodesPool(opts.w_pool_size)
            self.fake_w_pool = LatentCodesPool(opts.w_pool_size)

        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnames=("stage",))
        self._val_step = jax.jit(self._val_step_impl, static_argnames=("stage",))
        self._rng = rng

    # ------------------------------------------------------------- helpers

    def _graft_decoder(self, decoder_variables: dict) -> None:
        """Install converted generator weights into the RestyleNet tree."""
        for col in ("params", "buffers", "ema"):
            if col in decoder_variables:
                self.variables[col] = dict(self.variables[col])
                self.variables[col]["decoder"] = decoder_variables[col]

    def _trainable(self, params: dict) -> dict:
        sub = {"encoder": params["encoder"]}
        if self.opts.train_decoder:
            sub["decoder"] = params["decoder"]
        return sub

    def _merge(self, params: dict, trainable: dict) -> dict:
        return {**params, **trainable}

    def _compute_avg_image(self) -> jax.Array:
        codes = jnp.broadcast_to(
            self.latent_avg[None, None, :],
            (1, self.n_styles, self.decoder_cfg.w_dim))
        img, _ = self.model.apply(self.variables, codes, input_code=True)
        return img[0]

    def _current_stage(self) -> int:
        if not (self.is_e4e and self.opts.progressive_steps):
            return INFERENCE_STAGE
        stage = 0
        for i, step in enumerate(self.opts.progressive_steps):
            if self.global_step >= step:
                stage = i
        return min(stage, self.n_styles - 1)

    # ---------------------------------------------------------- loss logic

    def _restyle_forward(self, variables, batch, train: bool, stage: int):
        """All ReStyle iterations; returns per-iter (y_hat, latent) + new BN."""
        x, y = batch
        n = x.shape[0]
        y_hat = jnp.broadcast_to(self.avg_image[None], (n,) + self.avg_image.shape)
        latent = None
        outputs = []
        batch_stats = variables.get("batch_stats", {})
        for _ in range(self.opts.n_iters_per_batch):
            x_input = jnp.concatenate([x, y_hat], axis=-1)
            v = {**variables, "batch_stats": batch_stats}
            if train:
                (y_hat, latent), mutated = self.model.apply(
                    v, x_input, latent=latent, latent_avg=self.latent_avg,
                    train=True, stage=stage, mutable=["batch_stats"],
                    force_fp32=self.opts.force_fp32_decoder)
                batch_stats = mutated["batch_stats"]
            else:
                y_hat, latent = self.model.apply(
                    v, x_input, latent=latent, latent_avg=self.latent_avg,
                    stage=stage, force_fp32=self.opts.force_fp32_decoder)
            outputs.append((y_hat, latent))
        return outputs, batch_stats

    def _calc_loss(self, x, y, y_hat, latent, disc_params, stage: int):
        """λ-weighted loss of one ReStyle iteration (coach calc_loss parity)."""
        opts = self.opts
        loss = jnp.zeros((), jnp.float32)
        metrics = {}

        if self.disc is not None:
            dims = (list(range(min(stage + 1, self.n_styles)))
                    if (self.is_e4e and opts.progressive_steps
                        and stage != INFERENCE_STAGE)
                    else list(range(self.n_styles)))
            fake_pred = self.disc.apply(
                {"params": disc_params},
                latent[:, jnp.asarray(dims), :].reshape(-1, latent.shape[-1]))
            loss_disc = jnp.mean(jax.nn.softplus(-fake_pred))
            metrics["encoder_discriminator_loss"] = loss_disc
            loss += opts.w_discriminator_lambda * loss_disc

        if (self.is_e4e and opts.progressive_steps
                and stage not in (INFERENCE_STAGE,)):
            first_w = latent[:, 0, :]
            total_delta = jnp.zeros((), jnp.float32)
            for i in range(1, min(stage + 1, self.n_styles)):
                delta = latent[:, i, :] - first_w
                total_delta += jnp.mean(
                    jnp.linalg.norm(delta, ord=opts.delta_norm, axis=1))
            metrics["total_delta_loss"] = total_delta
            loss += opts.delta_norm_lambda * total_delta

        if opts.id_lambda > 0:
            net, v = self.loss_nets["id"]
            loss_id, sim, _ = net.apply(v, y_hat, y, x)
            metrics["loss_id"] = loss_id
            metrics["id_improve"] = sim
            loss += loss_id * opts.id_lambda
        if opts.l2_lambda > 0:
            loss_l2 = jnp.mean(jnp.square(y_hat - y))
            metrics["loss_l2"] = loss_l2
            loss += loss_l2 * opts.l2_lambda
        if opts.lpips_lambda > 0:
            net, v = self.loss_nets["lpips"]
            loss_lpips = net.apply(v, y_hat, y)
            metrics["loss_lpips"] = loss_lpips
            loss += loss_lpips * opts.lpips_lambda
        if opts.w_norm_lambda > 0:
            loss_w = w_norm_loss(latent, self.latent_avg,
                                 opts.start_from_latent_avg)
            metrics["loss_w_norm"] = loss_w
            loss += loss_w * opts.w_norm_lambda
        if opts.moco_lambda > 0:
            net, v = self.loss_nets["moco"]
            loss_moco, sim, _ = net.apply(v, y_hat, y, x)
            metrics["loss_moco"] = loss_moco
            metrics["id_improve"] = sim
            loss += loss_moco * opts.moco_lambda

        metrics["loss"] = loss
        return loss, metrics

    # ---------------------------------------------------------- train steps

    def _train_step_impl(self, trainable, frozen, batch_stats, opt_state,
                         batch, disc_params, stage: int):
        other = {k: v for k, v in self.variables.items()
                 if k not in ("params", "batch_stats")}

        def loss_fn(trainable):
            variables = {"params": self._merge(frozen, trainable),
                         "batch_stats": batch_stats, **other}
            outputs, new_bs = self._restyle_forward(variables, batch,
                                                    train=True, stage=stage)
            x, y = batch
            total = jnp.zeros((), jnp.float32)
            metrics = {}
            for y_hat, latent in outputs:
                l, m = self._calc_loss(x, y, y_hat, latent, disc_params, stage)
                total += l
                metrics = m  # keep last iteration's metrics (reference logs last)
            metrics["loss_total"] = total
            return total, (metrics, new_bs, outputs[-1][0])

        (_, (metrics, new_bs, y_hat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_bs, opt_state, metrics, y_hat

    def _val_step_impl(self, params, batch_stats, batch, disc_params,
                       stage: int):
        other = {k: v for k, v in self.variables.items()
                 if k not in ("params", "batch_stats")}
        variables = {"params": params, "batch_stats": batch_stats, **other}
        outputs, _ = self._restyle_forward(variables, batch, train=False,
                                           stage=stage)
        x, y = batch
        _, metrics = self._calc_loss(x, y, outputs[-1][0], outputs[-1][1],
                                     disc_params, stage)
        return metrics, outputs[-1][0]

    # ------------------------------------------------- discriminator steps

    def _sample_real_fake_w(self, x, rng):
        """(real_w [N, num_ws, w], fake_w [N, n_styles, w]) before pooling.

        fake_w is the RAW encoder output (reference feeds encoder(x) with no
        latent_avg residual, coach_restyle_e4e.py:510). A 6-channel encoder
        gets the average image appended — the first-iteration convention.
        """
        z = jax.random.normal(rng, (x.shape[0], self.decoder_cfg.z_dim))
        real_w = self.model.apply(
            self.variables, z, truncation_psi=self.opts.truncation_psi,
            method=lambda m, z, **kw: m.decoder.map(z, **kw))
        if self.opts.input_nc == 6 and x.shape[-1] == 3:
            n = x.shape[0]
            avg = jnp.broadcast_to(self.avg_image[None],
                                   (n,) + self.avg_image.shape)
            x = jnp.concatenate([x, avg], axis=-1)
        fake_w = self.model.apply(self.variables, x,
                                  method=lambda m, x: m.encoder(x))
        return real_w, fake_w

    def train_discriminator(self, x) -> Dict[str, float]:
        """One D step incl. pooling and periodic R1 (reference :462-494)."""
        opts = self.opts
        self._rng, k = jax.random.split(self._rng)
        real_w, fake_w = jax.device_get(self._sample_real_fake_w(jnp.asarray(x), k))
        stage = self._current_stage()
        if opts.progressive_steps and stage != INFERENCE_STAGE:
            fake_w = fake_w[:, :min(stage + 1, self.n_styles), :]
        if opts.use_w_pool:
            real_w = self.real_w_pool.query(real_w)
            fake_w = self.fake_w_pool.query(fake_w)
        if fake_w.ndim == 3:
            fake_w = fake_w[:, 0, :]
        if real_w.ndim == 3:
            real_w = real_w[:, 0, :]

        d_params = self.disc_variables["params"]

        def d_loss_fn(d_params, real_w, fake_w):
            real_pred = self.disc.apply({"params": d_params}, real_w)
            fake_pred = self.disc.apply({"params": d_params}, fake_w)
            real_loss = jnp.mean(jax.nn.softplus(-real_pred))
            fake_loss = jnp.mean(jax.nn.softplus(fake_pred))
            return real_loss + fake_loss, (real_loss, fake_loss)

        (loss, (rl, fl)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params, jnp.asarray(real_w), jnp.asarray(fake_w))
        updates, self.disc_opt_state = self.disc_tx.update(
            grads, self.disc_opt_state, d_params)
        self.disc_variables = {"params": optax.apply_updates(d_params, updates)}
        out = {"discriminator_loss": float(loss), "d_real_loss": float(rl),
               "d_fake_loss": float(fl)}

        if self.global_step % opts.d_reg_every == 0:
            d_params = self.disc_variables["params"]

            def r1_loss_fn(d_params, w):
                def pred_sum(w):
                    return jnp.sum(self.disc.apply({"params": d_params}, w))
                g = jax.grad(pred_sum)(w)
                pen = jnp.mean(jnp.sum(jnp.square(
                    g.reshape(g.shape[0], -1)), axis=1))
                return opts.r1 / 2 * pen * opts.d_reg_every

            r1_loss, grads = jax.value_and_grad(r1_loss_fn)(
                d_params, jnp.asarray(real_w))
            updates, self.disc_opt_state = self.disc_tx.update(
                grads, self.disc_opt_state, d_params)
            self.disc_variables = {
                "params": optax.apply_updates(d_params, updates)}
            out["discriminator_r1_loss"] = float(r1_loss)
        return out

    # ---------------------------------------------------------- public API

    def train_step(self, batch) -> Dict[str, float]:
        """One full optimizer micro-step (G step + optional D step)."""
        x, y = (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
        metrics = {}
        if self.disc is not None:
            metrics.update(self.train_discriminator(x))

        stage = self._current_stage()
        params = self.variables["params"]
        trainable = self._trainable(params)
        frozen = {k: v for k, v in params.items() if k not in trainable}
        disc_params = (self.disc_variables["params"] if self.disc is not None
                       else {})
        trainable, new_bs, self.opt_state, m, y_hat = self._train_step(
            trainable, frozen, self.variables.get("batch_stats", {}),
            self.opt_state, (x, y), disc_params, stage)
        self.variables["params"] = self._merge(params, trainable)
        self.variables["batch_stats"] = new_bs
        metrics.update({k: float(v) for k, v in m.items()})
        self.stats.update(metrics)
        self.global_step += 1
        return metrics

    def validate(self, val_batches) -> Dict[str, float]:
        stage = self._current_stage()
        agg = StatsCollector()
        disc_params = (self.disc_variables["params"] if self.disc is not None
                       else {})
        for batch in val_batches:
            x, y = (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
            m, _ = self._val_step(self.variables["params"],
                                  self.variables.get("batch_stats", {}),
                                  (x, y), disc_params, stage)
            agg.update({k: float(v) for k, v in m.items()})
        return {k: agg.mean(k) for k in agg.names()}

    def train(self, train_iter, val_batches_fn=None, max_steps=None):
        """The outer loop: steps, validation, best-checkpoint tracking."""
        opts = self.opts
        max_steps = max_steps or opts.max_steps
        start = time.time()
        log_path = Path(opts.exp_dir) / "stats.jsonl"
        log_path.parent.mkdir(parents=True, exist_ok=True)
        # TensorBoard events + recurring source/reconstruction grids
        # (reference coach_restyle_psp.py:277-319 parse_and_log_images).
        from ..runtime.events import EventWriter, save_image_grid
        writer = EventWriter(Path(opts.exp_dir) / "logs")
        from ..runtime.profiling import drain_scope_times, profiled_scope
        # Transfer overlap: device-place the next batch while this step
        # runs (data/prefetch.py; the reference's DataLoader-workers
        # analogue, coach_restyle_psp.py batch loop :91-112).
        from ..data.prefetch import DevicePrefetcher
        import jax.numpy as _jnp
        train_iter = DevicePrefetcher(
            iter(train_iter),
            lambda b: (_jnp.asarray(b[0]), _jnp.asarray(b[1])), depth=2)
        for batch in train_iter:
            with profiled_scope("coach_step"):
                metrics = self.train_step(batch)
            if self.global_step % opts.board_interval == 0:
                entry = {"step": self.global_step,
                         "time": round(time.time() - start, 2),
                         **{f"Timing/{k}": round(v, 4)
                            for k, v in drain_scope_times().items()},
                         **metrics}
                with open(log_path, "a") as f:
                    f.write(json.dumps(entry) + "\n")
                writer.scalars(metrics, step=self.global_step)
            if opts.image_interval and \
                    self.global_step % opts.image_interval == 0:
                x = np.asarray(batch[0][:4])
                y = np.asarray(batch[1][:4])
                outputs, _ = self._restyle_forward(
                    self.variables, (jnp.asarray(x), jnp.asarray(y)),
                    train=False, stage=self._current_stage())
                y_hat = np.asarray(outputs[-1][0])
                grid = save_image_grid(
                    np.concatenate([x, y_hat]),
                    Path(opts.exp_dir) / "logs" /
                    f"images_{self.global_step:06d}.png", cols=4)
                writer.image("reconstructions", grid, step=self.global_step)
            if val_batches_fn and self.global_step % opts.val_interval == 0:
                val = self.validate(val_batches_fn())
                if self.best_val_loss is None or val.get("loss", np.inf) < self.best_val_loss:
                    self.best_val_loss = val.get("loss")
                    self.checkpoint(Path(opts.exp_dir) / "checkpoints" / "best_model")
            if opts.save_interval and self.global_step % opts.save_interval == 0:
                self.checkpoint(Path(opts.exp_dir) / "checkpoints"
                                / f"iteration_{self.global_step}")
            if self.global_step >= max_steps:
                break
        return self

    # --------------------------------------------------------- checkpoints

    def checkpoint(self, path) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # multi-host: process 0 writes
        tree = {"variables": self.variables, "opt_state": self.opt_state,
                "latent_avg": self.latent_avg}
        if self.disc is not None:
            tree["disc_variables"] = self.disc_variables
            tree["disc_opt_state"] = self.disc_opt_state
        meta = {"opts": opts_to_dict(self.opts),
                "global_step": self.global_step,
                "best_val_loss": self.best_val_loss,
                "is_e4e": self.is_e4e}
        save_pytree(path, tree, meta)

    def restore(self, path) -> "Coach":
        tree, meta = load_pytree(path)
        restored = jax.tree_util.tree_map(jnp.asarray, tree)
        self.variables = restored["variables"]
        self.opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]))
        self.latent_avg = restored["latent_avg"]
        if self.disc is not None and "disc_variables" in restored:
            self.disc_variables = restored["disc_variables"]
            self.disc_opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.disc_opt_state),
                jax.tree_util.tree_leaves(restored["disc_opt_state"]))
        if meta:
            self.global_step = int(meta.get("global_step", 0))
            self.best_val_loss = meta.get("best_val_loss")
        self.avg_image = self._compute_avg_image()
        return self
