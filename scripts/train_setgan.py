"""Train SetGAN (CLI).

Parity: reference train_setgan.py — config tree → training loop with ticks,
snapshots, conditional FID. The reference's multiprocessing/NCCL launcher
(:38-118) is replaced by single-program pjit over the device mesh; its
timed-restart machinery (exit code 3, :522-530) by snapshot+`--resume`.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional, Tuple

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from stylegan3_editing_tpu.models.sg3 import SG3Config, sg3_t_config
from stylegan3_editing_tpu.models.sg3.convert import load_torch_pt, npz_to_variables
from stylegan3_editing_tpu.setgan.dataset import (
    ClassImageDataset,
    ImageMultiSetGenerator,
    SafeClassImageDataset,
)
from stylegan3_editing_tpu.setgan.loss import SetGANLossConfig
from stylegan3_editing_tpu.setgan.metrics import ConditionalFID
from stylegan3_editing_tpu.setgan.training_loop import (
    SetGANTrainConfig,
    SetGANTrainer,
)
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class SetGANCliOptions:
    outdir: str = "./experiments/setgan"
    data: str = "./data"
    # Named dataset wiring (reference train_setgan.py --dataset): celeba /
    # celeba-ident / imagenet / vggface / animalfaces / flowers / cifar100 /
    # mini-imagenet. Empty → treat --data as a class-per-subfolder root.
    dataset: Optional[str] = None
    data_augmentation: bool = False  # set-consistent flip+rotation aug
    resolution: int = 256
    total_kimg: float = 10000
    encoder_res: int = 256  # reference --encoder_res (encoder init input)
    devices: Optional[int] = None  # mesh over first N devices (ref --gpus)
    batch: int = 8
    reference_min: int = 7
    reference_max: int = 12
    candidate_min: int = 1
    candidate_max: int = 4
    stem: str = "sg3"  # sg3 | sg2 | fastgan (decoder stem)
    # Projected-D feature backbones: comma-separated names from the feature
    # registry (models/backbones/registry.py, reference train_setgan.py
    # --backbones / pretrained_builder families). Empty -> reference default
    # pair (DeiT-base-distilled + EfficientNet-lite0).
    backbones: Optional[str] = None
    glr: float = 0.0025
    dlr: float = 0.002
    ema_kimg: float = 10.0
    tick_kimg: float = 4.0
    snapshot_ticks: int = 50
    eval_ticks: int = 50
    # Reference defaults (train_setgan.py:244-246): D sees blurred images
    # early, fading out over 300 kimg. Sigma is bucketed to 0.1 per
    # compilation (bounded recompiles); 0 disables.
    blur_init_sigma: float = 2.0
    blur_fade_kimg: float = 300.0
    pl_weight: float = 0.0
    seed: int = 0
    resume: Optional[str] = None
    # ADA target for p-gated candidate DiffAugment (None = keep the
    # projected-GAN unconditional DiffAugment; reference heuristic
    # setgan/training_loop.py:482-486).
    ada_target: Optional[float] = None
    generator_path: Optional[str] = None  # pretrained stem (.pt/.npz)
    # Progressive superres phase (reference train_setgan.py:360-361, 508 +
    # scripts/train_setgan_superres.sh): grow the decoder from a previous
    # run's snapshot and train ONLY the new head layers.
    superres: bool = False
    head_layers: int = 7
    up_factor: int = 2  # stem res fallback when the snapshot has no meta
    path_stem: Optional[str] = None  # stem snapshot (.npz from a stem run)
    # "Pretrained" phase (reference scripts/train_setgan_pretrained.sh:
    # --use_pretrained --freeze_encoder --freeze_decoder): only the
    # set-attention (and D) train.
    freeze_encoder: bool = False
    freeze_decoder: bool = False
    encoder_path: Optional[str] = None  # coach checkpoint (ReStyle encoder)
    restyle_mode: str = "none"  # none | encoder (iterative ref encoding)
    restyle_iters: int = 3
    # Architecture knobs (reference --g/d_attn_heads/layers etc.)
    g_attn_heads: int = 4
    g_attn_layers: int = 2
    d_attn_heads: int = 4
    d_attn_layers: int = 2
    d_latent: int = 512
    # Remat the frozen D feature trunks — fits the canonical batch 4/chip
    # into 16 GB v5e HBM at the cost of one extra trunk forward per backward.
    d_remat_features: bool = False
    # Remat the reference-set encoder trunk (the measured batch-4 HBM floor
    # is its B*R x 256^2 IR-SE activations, not the D trunks).
    g_remat_encoder: bool = False
    use_set_decoder: bool = True
    use_temperature: bool = False
    disable_style_concat: bool = False
    no_mean_center: bool = False
    encoder_type: str = "ProgressiveBackboneEncoder"
    # IR(-SE) trunk depth (reference fixes 50; 8 = CI/dryrun minimal trunk).
    encoder_num_layers: int = 50
    # FID feature network: converted InceptionV3 (pool3) weights .npz — the
    # reference's extractor (setgan/metric_utils.py:374-402). Empty → the
    # in-repo InceptionV3 at random init (plumbing identical; numbers not
    # comparable to published FIDs until weights are supplied).
    inception_path: Optional[str] = None
    fid: bool = True  # False skips in-loop FID entirely (smoke/CI runs)
    fid_classes: int = 8  # classes sampled per eval
    fid_mode: str = "agg"  # agg | sfid | rfid
    # decoder capacity
    cbase: int = 16384
    cmax: int = 256
    syn_layers: int = 7
    fid_items_per_class: int = 256


def make_fid_eval_fn(opts: "SetGANCliOptions", dataset):
    """Class-conditional FID with InceptionV3 pool3 features.

    Parity: reference in-loop FID eval + best-model selection
    (setgan/training_loop.py:590-615, metrics.py:28-76); features from
    NVIDIA's InceptionV3 (metric_utils.py:374-402) — here the in-repo flax
    port with optionally converted weights.
    """
    import jax
    import jax.numpy as jnp

    from stylegan3_editing_tpu.models.backbones.inception import (
        InceptionV3Features, inception_feature_fn)
    from stylegan3_editing_tpu.runtime.checkpoint import load_pytree

    if opts.inception_path:
        variables = jax.tree_util.tree_map(
            jnp.asarray, load_pytree(opts.inception_path)[0])
    else:
        model = InceptionV3Features()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    feature_fn = inception_feature_fn(variables)
    rng = np.random.RandomState(opts.seed + 7)

    def eval_fn(trainer) -> float:
        fid = ConditionalFID(feature_fn,
                             max_items_per_class=opts.fid_items_per_class)
        n_classes = min(opts.fid_classes, len(dataset.classes))
        idxs = rng.choice(len(dataset.classes), n_classes, replace=False)
        per = min(opts.fid_items_per_class, 16)
        for idx in idxs:
            key = dataset.classes[int(idx)]
            paths = dataset.class_to_paths[key][:per]
            real = np.stack([dataset.load(p) for p in paths])
            refs = real[None, : max(len(real) // 2, 1)]
            fakes = trainer.generate(
                refs, num_candidates=len(real), use_ema=True)
            fid.append_real(int(idx), real)
            fid.append_fake(int(idx), np.asarray(fakes[0]))
        return fid.compute(opts.fid_mode)

    return eval_fn


def load_encoder_variables(path: str):
    """Pretrained ReStyle encoder variables from either a reference torch
    checkpoint (released restyle_{psp,e4e} weights or an `encoder.*`
    full-model subtree — reference SetGAN.load_weights, setgan.py:138-141)
    or a framework coach checkpoint."""
    if path.endswith((".pt", ".pth")):
        import torch

        from stylegan3_editing_tpu.models.encoders import (
            convert_restyle_encoder_state, encoder_state_from_model_checkpoint)
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        enc_vars, _info = convert_restyle_encoder_state(
            encoder_state_from_model_checkpoint(ckpt))
        return enc_vars
    # Coach checkpoint: its variables[col]["encoder"] subtree is the same
    # module class.
    from stylegan3_editing_tpu.runtime.checkpoint import load_pytree
    coach_tree, _ = load_pytree(path)
    src = coach_tree.get("variables", coach_tree)
    return {col: src[col]["encoder"] for col in src
            if isinstance(src[col], dict) and "encoder" in src[col]}


def main(opts: SetGANCliOptions):
    # Multi-host entry (reference launcher: train_setgan.py:38-118 → here
    # env-gated jax.distributed.initialize; see parallel/multiprocess.py).
    from stylegan3_editing_tpu.parallel.multiprocess import (
        is_main_process, maybe_initialize_distributed)
    maybe_initialize_distributed()
    run_dir = Path(opts.outdir)
    run_dir.mkdir(parents=True, exist_ok=True)

    if opts.dataset:
        from stylegan3_editing_tpu.setgan.dataset import build_datasets
        eval_ds, dataset = build_datasets(opts.dataset, opts.data,
                                          opts.resolution)
    else:
        dataset = SafeClassImageDataset.from_folder(opts.data,
                                                    opts.resolution)
        eval_ds = dataset
    import jax as _jax
    # Per-host data shard: each process draws its LOCAL batch rows
    # (reference InfiniteSampler rank/num_replicas, misc.py:113-147).
    assert opts.batch % _jax.process_count() == 0, (
        opts.batch, _jax.process_count())
    data = ImageMultiSetGenerator(
        dataset, batch_size=opts.batch // _jax.process_count(),
        reference_range=(opts.reference_min, opts.reference_max),
        candidate_range=(opts.candidate_min, opts.candidate_max),
        data_augmentation=opts.data_augmentation,
        shard=_jax.process_index(), num_shards=_jax.process_count(),
        seed=opts.seed)

    decoder_cfg = sg3_t_config(
        opts.resolution, channel_base=opts.cbase, channel_max=opts.cmax,
        num_layers=opts.syn_layers)

    gen_vars = None
    if opts.generator_path:
        if opts.generator_path.endswith(".npz"):
            gen_vars = npz_to_variables(opts.generator_path)
        else:
            gen_vars, _ = load_torch_pt(opts.generator_path, decoder_cfg)

    stem_vars = None
    superres_cfg_kwargs = {}
    if opts.superres:
        assert opts.path_stem, "--superres needs --path_stem (stem snapshot)"
        from stylegan3_editing_tpu.models.sg3.superres import (
            head_layer_names, superres_config)
        from stylegan3_editing_tpu.runtime.checkpoint import load_pytree
        stem_tree, stem_meta = load_pytree(opts.path_stem)
        if stem_meta and stem_meta.get("decoder_cfg"):
            stem_cfg = SG3Config(**{k: (tuple(v) if isinstance(v, list)
                                        else v)
                                    for k, v in
                                    stem_meta["decoder_cfg"].items()})
        else:  # older snapshot: reconstruct from the CLI recipe
            stem_cfg = sg3_t_config(
                opts.resolution // opts.up_factor, channel_base=opts.cbase,
                channel_max=opts.cmax, num_layers=opts.syn_layers)
        decoder_cfg = superres_config(stem_cfg, opts.resolution,
                                      opts.head_layers)
        stem_vars = {col: stem_tree["g_vars"][col]["decoder"]
                     for col in ("params", "buffers", "ema")
                     if col in stem_tree.get("g_vars", {})}
        superres_cfg_kwargs = dict(
            train_head_only=True,
            head_layer_names=head_layer_names(decoder_cfg, stem_cfg))

    enc_vars = load_encoder_variables(opts.encoder_path) \
        if opts.encoder_path else None

    cfg = SetGANTrainConfig(
        total_kimg=opts.total_kimg, batch_size=opts.batch,
        g_lr=opts.glr, d_lr=opts.dlr, ema_kimg=opts.ema_kimg,
        # Resume disables EMA rampup and speeds ADA adaptation
        # (reference train_setgan.py:478-479).
        ema_rampup=None if opts.resume else 0.05,
        ada_target=opts.ada_target,
        ada_kimg=100.0 if opts.resume else 500.0,
        tick_kimg=opts.tick_kimg, snapshot_ticks=opts.snapshot_ticks,
        ref_resolution=opts.encoder_res,
        eval_ticks=opts.eval_ticks, seed=opts.seed, stem=opts.stem,
        **({"d_backbones": tuple(opts.backbones.split(","))}
           if opts.backbones else {}),
        freeze_encoder=opts.freeze_encoder,
        freeze_decoder=opts.freeze_decoder,
        restyle_mode=opts.restyle_mode,
        restyle_iters=opts.restyle_iters,
        g_attn_heads=opts.g_attn_heads, g_attn_layers=opts.g_attn_layers,
        d_attn_heads=opts.d_attn_heads, d_attn_layers=opts.d_attn_layers,
        d_latent_size=opts.d_latent,
        d_remat_features=opts.d_remat_features,
        g_remat_encoder=opts.g_remat_encoder,
        use_set_decoder=opts.use_set_decoder,
        use_temperature=opts.use_temperature,
        disable_style_concat=opts.disable_style_concat,
        mean_center=False if opts.no_mean_center else None,
        encoder_type=opts.encoder_type,
        encoder_num_layers=opts.encoder_num_layers,
        **superres_cfg_kwargs,
        loss=SetGANLossConfig(blur_init_sigma=opts.blur_init_sigma,
                              blur_fade_kimg=opts.blur_fade_kimg,
                              pl_weight=opts.pl_weight))
    mesh = None
    if opts.devices:
        from stylegan3_editing_tpu.parallel import create_mesh
        mesh = create_mesh(devices=_jax.devices()[:opts.devices])
    trainer = SetGANTrainer(cfg, decoder_cfg, mesh=mesh, run_dir=str(run_dir),
                            generator_variables=gen_vars,
                            stem_variables=stem_vars,
                            encoder_variables=enc_vars)
    if opts.resume:
        trainer.restore(opts.resume)

    eval_fn = make_fid_eval_fn(opts, eval_ds) if opts.fid else None
    # SG3TPU_TRACE_DIR-gated jax.profiler capture (reference profiling
    # scopes: torch_utils/misc.py:102-110, training_loop.py:304-309).
    from stylegan3_editing_tpu.runtime.profiling import (
        maybe_start_trace, stop_trace)
    maybe_start_trace()
    try:
        trainer.train(iter(data), eval_fn=eval_fn)
    finally:
        trace_dir = stop_trace()
        if trace_dir:
            print(f"profiler trace written to {trace_dir}")
    trainer.snapshot(run_dir / "final")  # no-op on non-zero processes
    if is_main_process():
        print(f"done at {trainer.cur_nimg / 1000:.1f} kimg, "
              f"best_fid={trainer.best_fid}")


if __name__ == "__main__":
    main(parse_dataclass(SetGANCliOptions))
