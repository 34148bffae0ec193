"""SetGAN training loop: pjit data-parallel, phase-based, tick-driven.

Parity: reference setgan/training_loop.py — phase machinery Gmain/Greg/Dmain
with lazy regularization (:283-313), warmup LR (:311-313), per-step random
set sizes (:398-423 — here masks over static maxima), G_ema tracking
(:467-476), tick-based status/snapshots/eval (:491-654), progress state in
snapshots (:571-588) and train_setgan.py's NCCL backend (:38-58).

TPU-native distribution: ONE program, batch sharded over the 'data' mesh
axis; gradient all-reduce, param broadcast, and stat sync are XLA
collectives inserted by the partitioner (no NCCL, no process groups, no
restart-flag broadcast — a single jitted step is already synchronous).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.sg3.config import SG3Config
from ..parallel.mesh import batch_sharding, create_mesh, replicated
from ..runtime.checkpoint import load_pytree, save_pytree
from ..runtime.training_stats import StatsCollector, moments, psum_moments
from .discriminator import ProjectedSetDiscriminator, projector_param_mask
from .loss import (
    SetGANLossConfig,
    blur_images,
    blur_sigma_at,
    d_main_loss,
    g_main_loss,
)
from .model import SetGAN, to_set


@dataclasses.dataclass
class SetGANTrainConfig:
    total_kimg: float = 10000
    batch_size: int = 8  # global batch (candidate sets per step)
    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta2: float = 0.99
    ema_kimg: float = 10.0
    # EMA ramp-up coefficient (reference training_loop.py:148,470):
    # early in training the EMA horizon is capped at
    # cur_nimg * ema_rampup. None disables (the reference does so on
    # --resume, train_setgan.py:479).
    ema_rampup: Optional[float] = 0.05
    # Input-pipeline depth: a daemon thread keeps this many batches
    # assembled AND device-placed ahead of the step (transfer
    # overlap; the reference's DataLoader-workers analogue). 0 =
    # place inline.
    prefetch_batches: int = 2
    warmup_kimg: float = 0.0
    g_reg_interval: int = 4
    tick_kimg: float = 4.0
    snapshot_ticks: int = 50
    eval_ticks: int = 50
    seed: int = 0
    # ADA (reference setgan/training_loop.py:482-486): None disables the
    # heuristic (D keeps unconditional DiffAugment); a target enables p-gated
    # candidate augmentation with host-side p adaptation.
    ada_target: Optional[float] = None
    ada_interval_imgs: int = 256
    ada_kimg: float = 500.0
    augment_p: float = 0.0
    # Projected-D feature backbones (reference train_setgan.py:227-234 uses
    # the DeiT-base-distilled + EfficientNet-lite0 pair; "vgg16_proj" is the
    # lightweight in-repo fallback).
    d_backbones: tuple = ("deit_base_distilled_patch16_224",
                          "tf_efficientnet_lite0")
    # Decoder stem: 'sg3' (alias-free), 'sg2' (XL aux SG2), 'fastgan'
    # (reference train_setgan.py:324 stem selection).
    stem: str = "sg3"
    # Encoder reference resolution (reference fixes 256; smaller values give
    # cheap CPU dryruns of the full step graph).
    ref_resolution: int = 256
    # None → reference rule `resolution < 224` (train_setgan.py:227);
    # ViT backbones are resized to their fixed 224 either way.
    d_interp224: Optional[bool] = None
    d_latent_size: int = 512
    d_num_discs: int = 4
    # Remat the frozen D feature trunks (activations are pure recompute) —
    # the memory lever that fits the canonical batch 4/chip into 16 GB v5e
    # HBM (VERDICT r4 #4). Costs one extra trunk forward per backward.
    d_remat_features: bool = False
    # Remat the reference-set encoder trunk — the OTHER half of the
    # batch-4/chip memory fix: the round-5g breakdown puts the HBM floor in
    # the B·R×256² IR-SE activations, not the D trunks (see SetGAN.
    # remat_encoder). Costs one extra encoder forward per backward.
    g_remat_encoder: bool = False
    # Superres phase (reference train_setgan.py:360-361 + loss.py:117-121):
    # the decoder is grown from a pretrained stem and ONLY its head layers
    # train — decoder mapping + stem synthesis layers freeze (encoder /
    # set-attention / D keep training).
    train_head_only: bool = False
    head_layer_names: tuple = ()
    # "Pretrained" phase (reference scripts/train_setgan_pretrained.sh:
    # --use_pretrained --freeze_encoder --freeze_decoder): pretrained
    # ReStyle encoder + decoder stay fixed; only the set-attention trains.
    freeze_encoder: bool = False
    freeze_decoder: bool = False
    # ReStyle iterative reference encoding (reference --restyle_mode).
    restyle_mode: str = "none"  # 'none' | 'encoder'
    restyle_iters: int = 3
    # Architecture knobs (reference --g_attn_heads/--g_attn_layers/
    # --d_attn_heads/--d_attn_layers/--use_set_decoder/--use_temperature/
    # --disable_style_concat/--no_mean_center/--encoder_type).
    g_attn_heads: int = 4
    g_attn_layers: int = 2
    d_attn_heads: int = 4
    d_attn_layers: int = 2
    use_set_decoder: bool = True
    use_temperature: bool = False
    disable_style_concat: bool = False
    mean_center: Optional[bool] = None  # None → off only for fastgan stems
    encoder_type: str = "ProgressiveBackboneEncoder"
    # IR(-SE) trunk depth (reference fixes 50; 8 = CI/dryrun minimal trunk).
    encoder_num_layers: int = 50
    loss: SetGANLossConfig = dataclasses.field(default_factory=SetGANLossConfig)


class SetGANTrainer:
    """Builds G/D/G_ema, compiles the phase steps, runs the tick loop."""

    def __init__(self, cfg: SetGANTrainConfig, decoder_cfg: SG3Config,
                 mesh=None, run_dir: Optional[str] = None,
                 generator_variables: Optional[dict] = None,
                 stem_variables: Optional[dict] = None,
                 encoder_variables: Optional[dict] = None):
        self.cfg = cfg
        self.decoder_cfg = decoder_cfg
        self.mesh = mesh or create_mesh()
        self.run_dir = Path(run_dir) if run_dir else None
        self.stats = StatsCollector()
        self.cur_nimg = 0
        self.cur_tick = 0
        self.best_fid: Optional[float] = None

        rng = jax.random.PRNGKey(cfg.seed)
        # FastGAN has no mapping net / w_avg → no mean-centering.
        mean_center = (cfg.mean_center if cfg.mean_center is not None
                       else cfg.stem != "fastgan")
        self.G = SetGAN(decoder_cfg, stem=cfg.stem,
                        mean_center=mean_center,
                        restyle_mode=cfg.restyle_mode,
                        restyle_iters=cfg.restyle_iters,
                        n_heads=cfg.g_attn_heads,
                        attn_layers=cfg.g_attn_layers,
                        use_set_decoder=cfg.use_set_decoder,
                        use_temperature=cfg.use_temperature,
                        disable_style_concat=cfg.disable_style_concat,
                        encoder_type=cfg.encoder_type,
                        encoder_num_layers=cfg.encoder_num_layers,
                        remat_encoder=cfg.g_remat_encoder)
        interp224 = (cfg.d_interp224 if cfg.d_interp224 is not None
                     else decoder_cfg.img_resolution < 224)
        self.D = ProjectedSetDiscriminator(
            backbones=tuple(cfg.d_backbones), interp224=interp224,
            latent_size=cfg.d_latent_size, num_discs=cfg.d_num_discs,
            attn_heads=cfg.d_attn_heads, attn_layers=cfg.d_attn_layers,
            remat_features=cfg.d_remat_features)

        res = decoder_cfg.img_resolution
        x0 = jnp.zeros((1, 2, cfg.ref_resolution, cfg.ref_resolution, 3))
        z0 = jnp.zeros((1, 1, decoder_cfg.z_dim))
        self.g_vars = jax.jit(self.G.init)(
            rng, x0, z0, latent_avg=jnp.zeros((decoder_cfg.w_dim,)))
        if generator_variables is not None:
            for col in ("params", "buffers", "ema"):
                if col in generator_variables:
                    self.g_vars[col] = dict(self.g_vars[col])
                    self.g_vars[col]["decoder"] = generator_variables[col]
        if stem_variables is not None:
            # Superres growth: merge a (smaller) pretrained stem's decoder
            # weights by name+shape into the grown decoder — the TPU
            # `reinit_stem` (reference resetting.py:679-696, invoked at
            # training_loop.py:249-251).
            from ..models.sg3.superres import reinit_stem

            dec = {col: self.g_vars[col]["decoder"]
                   for col in ("params", "buffers", "ema")
                   if col in self.g_vars}
            merged = reinit_stem(dec, stem_variables)
            for col, tree in merged.items():
                self.g_vars[col] = dict(self.g_vars[col])
                self.g_vars[col]["decoder"] = tree
        if encoder_variables is not None:
            # Pretrained ReStyle encoder (reference --use_pretrained): a
            # coach checkpoint's `variables[col]["encoder"]` subtree is the
            # SAME module class — merge by name+shape (a 6-channel ReStyle
            # first conv is skipped; references here are 3-channel).
            from ..models.sg3.superres import reinit_stem as _merge

            enc = {col: self.g_vars[col]["encoder"]
                   for col in ("params", "buffers", "ema", "batch_stats")
                   if col in self.g_vars
                   and "encoder" in self.g_vars[col]}
            merged = _merge(enc, encoder_variables)
            for col, tree in merged.items():
                self.g_vars[col] = dict(self.g_vars[col])
                self.g_vars[col]["encoder"] = tree
        r0 = jnp.zeros((1, 2, res, res, 3))
        c0 = jnp.zeros((1, 1, res, res, 3))
        self.d_vars = jax.jit(self.D.init)(jax.random.PRNGKey(cfg.seed + 1),
                                           r0, c0)

        self.latent_avg = (
            self.g_vars["ema"]["decoder"]["mapping"]["w_avg"]
            if cfg.stem != "fastgan" else jnp.zeros((decoder_cfg.w_dim,)))
        self.g_ema_params = jax.tree_util.tree_map(jnp.copy,
                                                   self.g_vars["params"])
        self.pl_mean = jnp.zeros(())

        # Warmup LR (training_loop.py:311-313): linear ramp over warmup_kimg.
        def g_schedule(step):
            if cfg.warmup_kimg <= 0:
                return cfg.g_lr
            warm_steps = cfg.warmup_kimg * 1000 / max(cfg.batch_size, 1)
            return cfg.g_lr * jnp.minimum((step + 1) / warm_steps, 1.0)

        g_adam = optax.adam(g_schedule, b1=0.0, b2=cfg.beta2)
        if cfg.train_head_only or cfg.freeze_encoder or cfg.freeze_decoder:
            # Frozen-group routing (reference requires_grad gating:
            # loss.py:117-121 for superres head-only;
            # train_setgan_pretrained.sh --freeze_encoder/--freeze_decoder
            # for the set-attention-only phase). set_to_zero, not
            # optax.masked — see the projector note above.
            heads = set(cfg.head_layer_names)

            def _label(path, _):
                keys = [p.key for p in path if hasattr(p, "key")]
                if keys and keys[0] == "encoder":
                    return "freeze" if cfg.freeze_encoder else "train"
                if keys and keys[0] == "decoder":
                    if cfg.freeze_decoder:
                        return "freeze"
                    if cfg.train_head_only:
                        if keys[1:2] == ["mapping"]:
                            return "freeze"
                        if keys[1:2] == ["synthesis"]:
                            name = keys[2] if len(keys) > 2 else ""
                            return "train" if name in heads else "freeze"
                return "train"

            g_labels = jax.tree_util.tree_map_with_path(
                _label, self.g_vars["params"])
            self.g_tx = optax.multi_transform(
                {"train": g_adam, "freeze": optax.set_to_zero()}, g_labels)
        else:
            self.g_tx = g_adam
        self.g_opt = self.g_tx.init(self.g_vars["params"])
        # Frozen projector: route its leaves to set_to_zero. (NOT
        # optax.masked — masked leaves would pass RAW GRADIENTS through as
        # updates, silently un-freezing the feature network.)
        d_mask = projector_param_mask(self.d_vars["params"])
        labels = jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", d_mask)
        self.d_tx = optax.multi_transform(
            {"train": optax.adam(cfg.d_lr, b1=0.0, b2=cfg.beta2),
             "freeze": optax.set_to_zero()}, labels)
        self.d_opt = self.d_tx.init(self.d_vars["params"])

        # ADA controller: host-side p adaptation from real-logit signs
        # (reference training_loop.py:482-486; the reference constructs its
        # augment pipe but its SetGAN loss never applies it — here p actually
        # gates the D's candidate DiffAugment).
        if cfg.ada_target is not None:
            from .ada import AdaController
            self.ada: Optional[AdaController] = AdaController(
                target=cfg.ada_target, interval_imgs=cfg.ada_interval_imgs,
                ada_kimg=cfg.ada_kimg)
            self.ada.state.p = float(cfg.augment_p)
        else:
            self.ada = None

        self._rng = jax.random.PRNGKey(cfg.seed + 2)
        # NOTE: no donate_argnums — params appear both as jit arguments and
        # as closure-captured collections; donation would alias-corrupt the
        # captured copies.
        self._g_step = jax.jit(self._g_step_impl,
                               static_argnames=("blur_sigma", "do_pl"))
        self._d_step = jax.jit(self._d_step_impl,
                               static_argnames=("blur_sigma",))
        self._ema_step = jax.jit(self._ema_impl)

    # ------------------------------------------------------------ G phase

    def _run_g(self, g_params, batch, z, return_latents=True):
        # Encoder runs in eval mode (reference default freeze_encoder=True;
        # its BatchNorms keep their loaded statistics).
        variables = {**self.g_vars, "params": g_params}
        return self.G.apply(
            variables, batch["reference"], z, latent_avg=self.latent_avg,
            ref_mask=batch["ref_mask"], return_latents=return_latents,
            train=False)

    def _g_step_impl(self, g_params, g_opt, d_params, batch, z, rng, pl_mean,
                     ada_p, blur_sigma: float, do_pl: bool):
        cfg = self.cfg

        def loss_fn(g_params):
            imgs, ws = self._run_g(g_params, batch, z)
            imgs_b = blur_images(imgs, blur_sigma)
            logits = self.D.apply(
                {**self.d_vars, "params": d_params}, batch["reference"],
                imgs_b, rng=rng, r_mask=batch["ref_mask"],
                x_mask=batch["cand_mask"],
                ada_p=ada_p if self.ada is not None else None)
            loss = g_main_loss(logits)
            stats = {"Loss/G/loss": loss,
                     "Loss/scores/fake_G": jnp.mean(logits)}
            new_pl = pl_mean
            if do_pl:
                variables = {**self.g_vars, "params": g_params}

                def decode_ws(w):
                    flat = w.reshape((-1,) + w.shape[2:])
                    img = self.G.apply(
                        variables, flat,
                        method=lambda m, v: m.decoder.synthesize(v))
                    return img

                shrink = max(ws.shape[0] // cfg.loss.pl_batch_shrink, 1)
                ws_small = ws[:shrink]
                imgs_pl, vjp_fn = jax.vjp(decode_ws, ws_small)
                h, w_ = imgs_pl.shape[1], imgs_pl.shape[2]
                noise = jax.random.normal(
                    jax.random.fold_in(rng, 1), imgs_pl.shape) / np.sqrt(h * w_)
                (pl_grads,) = vjp_fn(noise)
                pl_lengths = jnp.sqrt(jnp.mean(
                    jnp.sum(jnp.square(pl_grads), axis=-1), axis=-1))
                pl_lengths = pl_lengths.reshape(-1)
                new_pl = pl_mean + cfg.loss.pl_decay * (
                    jnp.mean(pl_lengths) - pl_mean)
                penalty = jnp.mean(jnp.square(pl_lengths - new_pl))
                stats["Loss/pl_penalty"] = penalty
                loss = loss + penalty * cfg.loss.pl_weight * cfg.g_reg_interval
            return loss, (stats, jax.lax.stop_gradient(new_pl))

        (_, (stats, new_pl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params)
        # NaN scrub (reference training_loop.py:452).
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        updates, g_opt = self.g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, stats, new_pl

    # ------------------------------------------------------------ D phase

    def _d_step_impl(self, d_params, d_opt, g_params, batch, z, rng,
                     ada_p, blur_sigma: float):
        def loss_fn(d_params):
            gen_imgs, _ = self._run_g(g_params, batch, z)
            gen_imgs = jax.lax.stop_gradient(gen_imgs)
            gen_b = blur_images(gen_imgs, blur_sigma)
            real_b = blur_images(batch["candidate"], blur_sigma)
            d_variables = {**self.d_vars, "params": d_params}
            fake_logits = self.D.apply(
                d_variables, batch["reference"], gen_b,
                rng=jax.random.fold_in(rng, 0),
                r_mask=batch["ref_mask"], x_mask=batch["cand_mask"],
                ada_p=ada_p if self.ada is not None else None)
            real_logits = self.D.apply(
                d_variables, batch["reference"], real_b,
                rng=jax.random.fold_in(rng, 1),
                r_mask=batch["ref_mask"], x_mask=batch["cand_mask"],
                ada_p=ada_p if self.ada is not None else None)
            loss, stats = d_main_loss(real_logits, fake_logits)
            return loss, (stats, real_logits, fake_logits)

        (_, (stats, real_logits, fake_logits)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        # Cross-device moment sync — ONE psum of the stacked (count, sum,
        # sum-sq) matrix, the TPU equivalent of the reference's single
        # all-reduce of concatenated counters (training_stats.py:235).
        mstats = self._moment_stats({"scores/real": real_logits,
                                     "scores/fake": fake_logits,
                                     "signs/real": jnp.sign(real_logits),
                                     "signs/fake": jnp.sign(fake_logits)})
        stats = dict(stats)
        for k, m in mstats.items():
            stats["Loss/" + k] = m[1] / jnp.maximum(m[0], 1.0)
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        updates, d_opt = self.d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, stats

    def _moment_stats(self, named):
        """Per-shard moments + one `lax.psum` over the 'data' mesh axis
        (runtime.training_stats.psum_moments), under shard_map so the
        collective is explicit — not left to the GSPMD partitioner."""
        try:
            from jax import shard_map
        except ImportError:  # newer jax
            from jax import shard_map
        from jax.sharding import PartitionSpec as P

        keys = list(named.keys())

        def local(*vs):
            ms = {k: moments(v) for k, v in zip(keys, vs)}
            out = psum_moments(ms, "data")
            return tuple(out[k] for k in keys)

        fn = shard_map(local, mesh=self.mesh,
                       in_specs=tuple(P("data") for _ in keys),
                       out_specs=tuple(P() for _ in keys))
        return dict(zip(keys, fn(*[named[k] for k in keys])))

    def _ema_impl(self, g_ema, g_params, beta):
        return jax.tree_util.tree_map(
            lambda e, p: p + beta * (e - p), g_ema, g_params)

    # ------------------------------------------------------------ stepping

    def _place_batch(self, batch: Dict[str, np.ndarray]) -> Dict:
        """Host batch → device-placed (dp-sharded) batch + host metadata.

        Runs inside the prefetch thread so the transfer overlaps the
        previous step; host-only quantities (ADA candidate count, grid
        reference rows) are captured BEFORE placement — a multi-host global
        array is not host-readable.
        """
        from ..parallel.multiprocess import put_global_batch

        local_b = batch["reference"].shape[0]
        meta = {
            "local_b": local_b,
            # Candidate count for ADA, from the LOCAL mask.
            "local_c_eff": (int(np.sum(batch["cand_mask"]))
                            if "cand_mask" in batch
                            else local_b * batch["candidate"].shape[1]),
            "reference_head": np.asarray(batch["reference"][:4]),
        }
        data_shard = batch_sharding(self.mesh)
        placed = {k: (put_global_batch(data_shard, v)
                      if k != "classes" else v) for k, v in batch.items()}
        placed["_meta"] = meta
        return placed

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """One G+D step. `batch` is this PROCESS's local shard (= the global
        batch in single-process runs; in multi-host runs each host feeds its
        rows and `put_global_batch` assembles the global sharded arrays —
        the reference instead sharded via InfiniteSampler rank/replicas,
        torch_utils/misc.py:113-147)."""
        from ..parallel.multiprocess import put_global_batch

        cfg = self.cfg
        dp = self.mesh.shape["data"]
        pc = jax.process_count()
        if "_meta" not in batch:
            batch = self._place_batch(batch)
        batch = dict(batch)
        meta = batch.pop("_meta")
        local_b = meta["local_b"]
        local_c_eff = meta["local_c_eff"]
        global_b = local_b * pc
        assert global_b % dp == 0, (
            f"global batch {global_b} must divide the "
            f"'data' mesh axis ({dp})")
        data_shard = batch_sharding(self.mesh)
        c_max = batch["candidate"].shape[1]
        self._rng, kz, kd, kg = jax.random.split(self._rng, 4)
        # Same key on every host → identical global z; each host contributes
        # its row block so the shards agree.
        z_np = np.asarray(jax.random.normal(
            kz, (global_b, c_max, self.decoder_cfg.z_dim)))
        z = put_global_batch(
            data_shard,
            z_np[jax.process_index() * local_b:
                 (jax.process_index() + 1) * local_b] if pc > 1 else z_np)

        # Quantize the fading sigma so the jitted steps recompile a bounded
        # number of times across the fade (static blur taps).
        blur_sigma = float(np.round(blur_sigma_at(self.cur_nimg, cfg.loss), 1))
        step_idx = self.cur_nimg // max(cfg.batch_size, 1)
        do_pl = (cfg.loss.pl_weight > 0
                 and self.cur_nimg >= cfg.loss.pl_start_nimg
                 and step_idx % cfg.g_reg_interval == 0)

        ada_p = jnp.asarray(self.ada.state.p if self.ada else 0.0,
                            jnp.float32)
        # Per-phase trace scopes (reference record_function phases,
        # setgan/training_loop.py:304-309, :445); host times drain into the
        # tick stats as Timing/*.
        from ..runtime.profiling import profiled_scope
        with profiled_scope("Dmain"):
            self.d_vars["params"], self.d_opt, d_stats = self._d_step(
                self.d_vars["params"], self.d_opt, self.g_vars["params"],
                batch, z, kd, ada_p, blur_sigma=blur_sigma)
        with profiled_scope("Gmain"):
            self.g_vars["params"], self.g_opt, g_stats, self.pl_mean = \
                self._g_step(
                    self.g_vars["params"], self.g_opt, self.d_vars["params"],
                    batch, z, kg, self.pl_mean, ada_p,
                    blur_sigma=blur_sigma, do_pl=do_pl)

        # G_ema (beta from ema_kimg + rampup, training_loop.py:467-476).
        ema_nimg = cfg.ema_kimg * 1000
        if cfg.ema_rampup is not None:
            ema_nimg = min(ema_nimg, self.cur_nimg * cfg.ema_rampup)
        beta = 0.5 ** (cfg.batch_size / max(ema_nimg, 1e-8))
        self.g_ema_params = self._ema_step(self.g_ema_params,
                                           self.g_vars["params"],
                                           jnp.asarray(beta))

        self.cur_nimg += cfg.batch_size
        metrics = {k: float(v) for k, v in {**d_stats, **g_stats}.items()}
        # ADA p adaptation from this step's real-logit signs
        # (reference training_loop.py:482-486).
        if self.ada is not None:
            metrics["Progress/augment"] = self.ada.update(
                metrics["Loss/signs/real"], local_c_eff * pc)
        self.stats.update(metrics)
        return metrics

    # --------------------------------------------------------- inference

    def generate(self, references: np.ndarray, num_candidates: int,
                 use_ema: bool = True, seed: int = 0) -> np.ndarray:
        """Sample candidate images conditioned on reference sets.

        references: [B, R, H, W, 3] in [-1, 1]. Returns [B, num_candidates,
        res, res, 3]. Parity: the reference's G_ema eval/grid path
        (setgan/training_loop.py:315-346, :590-615).
        """
        refs = jnp.asarray(references)
        b = refs.shape[0]
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (b, num_candidates, self.decoder_cfg.z_dim))
        params = self.g_ema_params if use_ema else self.g_vars["params"]
        imgs, _ = self._run_g(
            params, {"reference": refs,
                     "ref_mask": jnp.ones(refs.shape[:2], bool)}, z)
        return np.asarray(imgs)

    # ------------------------------------------------------------ the loop

    def train(self, data: Iterable, total_kimg: Optional[int] = None,
              eval_fn: Optional[Callable[["SetGANTrainer"], float]] = None,
              log_fn: Optional[Callable[[dict], None]] = None):
        cfg = self.cfg
        total_nimg = (total_kimg or cfg.total_kimg) * 1000
        tick_nimg = cfg.tick_kimg * 1000
        next_tick = tick_nimg
        t_start = t_tick = time.time()
        writer = grid_refs = None
        if self.run_dir:
            from ..runtime.events import EventWriter, module_summary
            writer = EventWriter(self.run_dir)
            # print_module_summary analogue (reference training_loop prints
            # G/D summaries at startup, torch_utils/misc.py:198).
            for name, tree in (("G", self.g_vars), ("D", self.d_vars)):
                text = f"=== {name} ===\n{module_summary(tree)}"
                print(text)
                with open(self.run_dir / "module_summary.txt", "a") as f:
                    f.write(text + "\n")
        from ..data.prefetch import DevicePrefetcher, maybe_prefetch
        it = maybe_prefetch(iter(data), self._place_batch,
                            cfg.prefetch_batches)
        try:
            self._train_loop(it, total_nimg, tick_nimg, next_tick, t_start,
                             t_tick, writer, grid_refs, eval_fn, log_fn)
        finally:
            if isinstance(it, DevicePrefetcher):
                it.close()
        return self

    def _train_loop(self, it, total_nimg, tick_nimg, next_tick, t_start,
                    t_tick, writer, grid_refs, eval_fn, log_fn):
        cfg = self.cfg
        for batch in it:
            if grid_refs is None:
                # Fixed reference sets for the recurring sample grid
                # (reference setgan/training_loop.py:315-346).
                grid_refs = batch["_meta"]["reference_head"]
            metrics = self.train_step(batch)
            if self.cur_nimg >= next_tick or self.cur_nimg >= total_nimg:
                from ..runtime.profiling import drain_scope_times
                now = time.time()
                entry = {
                    "tick": self.cur_tick,
                    "kimg": self.cur_nimg / 1000,
                    "sec_per_tick": round(now - t_tick, 2),
                    "sec_per_kimg": round((now - t_tick) /
                                          max(tick_nimg / 1000, 1e-8), 2),
                    "total_hours": round((now - t_start) / 3600, 3),
                    **{f"Timing/{k}": round(v, 4)
                       for k, v in drain_scope_times().items()},
                    **{k: round(self.stats.mean(k), 4)
                       for k in self.stats.names()},
                }
                print(json.dumps(entry))
                if log_fn:
                    log_fn(entry)
                if self.run_dir:
                    with open(self.run_dir / "stats.jsonl", "a") as f:
                        f.write(json.dumps(entry) + "\n")
                self.stats.reset()
                if eval_fn and self.cur_tick % cfg.eval_ticks == 0 \
                        and self.cur_tick > 0:
                    fid = eval_fn(self)
                    print(json.dumps({"tick": self.cur_tick, "fid": fid}))
                    if self.best_fid is None or fid < self.best_fid:
                        self.best_fid = fid
                        if self.run_dir:
                            self.snapshot(self.run_dir / "best_model")
                if writer is not None:
                    writer.scalars(entry, step=self.cur_nimg)
                if self.run_dir and self.cur_tick % cfg.snapshot_ticks == 0:
                    self.snapshot(self.run_dir /
                                  f"snapshot_{self.cur_nimg // 1000:06d}")
                    from ..runtime.events import save_image_grid
                    fakes = self.generate(grid_refs, num_candidates=4)
                    grid = save_image_grid(
                        fakes.reshape((-1,) + fakes.shape[2:]),
                        self.run_dir /
                        f"fakes_{self.cur_nimg // 1000:06d}.png", cols=4)
                    if writer is not None:
                        writer.image("fakes", grid, step=self.cur_nimg)
                self.cur_tick += 1
                t_tick = time.time()
                next_tick += tick_nimg
            if self.cur_nimg >= total_nimg:
                break

    # --------------------------------------------------------- checkpoints

    def snapshot(self, path) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # reference: rank 0 writes (training_loop.py:548-588)
        tree = {"g_vars": self.g_vars, "d_vars": self.d_vars,
                "g_ema_params": self.g_ema_params,
                "g_opt": self.g_opt, "d_opt": self.d_opt,
                "pl_mean": self.pl_mean}
        meta = {"cur_nimg": self.cur_nimg, "cur_tick": self.cur_tick,
                "best_fid": self.best_fid,
                "cfg": dataclasses.asdict(self.cfg),
                # Enables superres growth from this snapshot (--path_stem):
                # the stem's architecture travels with its weights.
                "decoder_cfg": dataclasses.asdict(self.decoder_cfg)}
        if self.ada is not None:
            meta["ada"] = dataclasses.asdict(self.ada.state)
        save_pytree(path, tree, meta)

    def restore(self, path) -> "SetGANTrainer":
        tree, meta = load_pytree(path)
        restored = jax.tree_util.tree_map(jnp.asarray, tree)
        self.g_vars = restored["g_vars"]
        self.d_vars = restored["d_vars"]
        self.g_ema_params = restored["g_ema_params"]
        self.g_opt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.g_opt),
            jax.tree_util.tree_leaves(restored["g_opt"]))
        self.d_opt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.d_opt),
            jax.tree_util.tree_leaves(restored["d_opt"]))
        self.pl_mean = restored["pl_mean"]
        if meta:
            self.cur_nimg = int(meta["cur_nimg"])
            self.cur_tick = int(meta["cur_tick"])
            self.best_fid = meta.get("best_fid")
            if self.ada is not None and meta.get("ada"):
                from .ada import AdaState
                self.ada.state = AdaState(**meta["ada"])
        return self
