"""Projected set discriminator: frozen feature backbones + random
projections + per-scale set comparisons.

Parity: reference models/setgan/discriminator.py (`SingleDisc` :19,
`MultiScaleD` comparing reference-set features to candidates :126,
`ProjectedSetDiscriminator` :148-236) and the F_RandomProj projector
(models/styleganxl/pg_modules/projector.py:55-111: random cross-channel CCM
1×1s and cross-scale CSM fusion over a frozen backbone's 4 feature stages).

Backbones: the reference pair — DeiT-base-distilled-patch16-224 and
tf_efficientnet_lite0 (train_setgan.py:227-234) — are in-repo flax ports
(models/backbones/{deit,efficientnet}.py) with timm weight converters;
VGG16 is kept as a lightweight fallback. Normalization stats are
per-backbone (reference projector.py:9-28: DeiT → ImageNet stats,
EfficientNet-lite → Inception 0.5/0.5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones import registry as fn_registry
from ..models.backbones.vgg import VGG16Features
from ..ops.image import resize_bilinear
from .diffaugment import diff_augment
from .model import to_images, to_set
from .set_transformer import MultiSetTransformerEncoder, PMA, masked_softmax

# midas-style channel schedule for the down stacks (discriminator.py:24-26).
_NFC_MIDAS = {4: 512, 8: 512, 16: 256, 32: 128, 64: 64, 128: 64,
              256: 32, 512: 16, 1024: 8}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
_INCEPTION_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_INCEPTION_STD = np.array([0.5, 0.5, 0.5], np.float32)

class TinyFeatures(nn.Module):
    """Minimal 4-stage conv feature net (/2, /4, /8, /16; 8-64 channels).

    NOT a reference backbone — exists so CI smoke tests and the driver's
    CPU-mesh dryrun compile the full projected-D graph in seconds instead
    of minutes. Production runs use the reference pair (DeiT + EffNet-lite0)
    or vgg16_proj."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        for i, c in enumerate((8, 16, 32, 64)):
            x = nn.Conv(c, (3, 3), strides=2, padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


# Legacy direct entry (5-stage VGG, sliced in FeatureProjector); every
# other name resolves through the generic feature-network registry
# (models/backbones/registry.py — the reference `_make_pretrained` analogue,
# pretrained_builder.py:118-195). Normalization stats come from the
# registry per backbone (constants.py:67-104 + projector.py:9-28 parity).
BACKBONES = {
    "vgg16_proj": (VGG16Features, _IMAGENET_MEAN, _IMAGENET_STD),
    "tiny_proj": (TinyFeatures, _INCEPTION_MEAN, _INCEPTION_STD),
}

# First feature stage's downsampling factor (registry backbones start at /4).
_FIRST_STAGE_STRIDE = {"vgg16_proj": 2, "tiny_proj": 2}


def resolve_backbone(name: str):
    """name → (module factory, mean, std) via BACKBONES or the registry."""
    if name in BACKBONES:
        return BACKBONES[name]
    spec = fn_registry.get_spec(name)
    return spec.make, spec.mean, spec.std


def backbone_fixed_res(name: str) -> Optional[int]:
    """ViT families need a fixed input size regardless of interp224
    (reference `self.interp224 or bb_name in VITS`, discriminator.py:225)."""
    if name in BACKBONES:
        return None
    return fn_registry.get_spec(name).fixed_input_res


class FeatureProjector(nn.Module):
    """Frozen backbone stages → random CCM (1×1) + CSM (top-down fusion).

    Projection weights are randomly initialized and NEVER trained (they live
    in 'params' but the train step masks them out — matching projected-GAN).
    """

    cout: int = 64
    proj_type: int = 2  # 0 none, 1 CCM, 2 CCM+CSM
    expand: bool = True
    backbone: str = "vgg16_proj"
    # Rematerialize the frozen trunk: its activations are pure recompute
    # (weights never train), so remat trades one extra trunk forward in the
    # backward for the whole activation footprint — the lever that fits the
    # reference's canonical batch 4/chip into 16 GB v5e HBM (VERDICT r4 #4;
    # the shortfall was 554 MB of 16.29 G). Off by default: single-batch
    # runs that fit should not pay the recompute.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        # resolve_backbone returns either a Module CLASS (BACKBONES dict) or
        # a zero-arg registry factory — construct first, then remat the
        # CALL: nn.remat over the factory itself is a TypeError for
        # factories (flax treats plain functions as lifted transforms whose
        # first argument must be a Module — the registry-backbone crash the
        # round-5c SetGAN stage hit).
        backbone = resolve_backbone(self.backbone)[0](name="backbone")
        if self.remat:
            feats = nn.remat(lambda m, xx: m(xx))(backbone, x)
        else:
            feats = backbone(x)
        if self.backbone == "vgg16_proj":
            feats = feats[1:]  # 4 stages: /2../16
        if self.proj_type == 0:
            return {str(i): f for i, f in enumerate(feats)}

        couts = ([self.cout, self.cout * 2, self.cout * 4, self.cout * 8]
                 if self.expand else [self.cout] * 4)
        ccm = [nn.Conv(couts[i], (1, 1), name=f"ccm{i}")(feats[i])
               for i in range(4)]
        if self.proj_type == 1:
            return {str(i): ccm[i] for i in range(4)}

        # CSM: top-down feature fusion (upsample deeper + add + 3×3 conv).
        csm_couts = ([self.cout, self.cout, self.cout * 2, self.cout * 4]
                     if self.expand else [self.cout] * 4)
        out: List[jax.Array] = [None] * 4
        prev = None
        for i in (3, 2, 1, 0):
            y = ccm[i]
            if prev is not None:
                up = resize_bilinear(prev, (y.shape[1], y.shape[2]))
                up = nn.Conv(y.shape[-1], (1, 1), name=f"csm_lat{i}")(up)
                y = y + up
            y = nn.relu(y)
            y = nn.Conv(csm_couts[i], (3, 3), padding=1, name=f"csm{i}")(y)
            out[i] = y
            prev = y
        return {str(i): out[i] for i in range(4)}


class SingleDisc(nn.Module):
    """Down-block stack collapsing a feature map to a latent vector."""

    start_sz: int
    end_sz: int = 8
    out_features: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        sizes = np.array(list(_NFC_MIDAS.keys()))
        start = int(sizes[np.argmin(np.abs(sizes - self.start_sz))])
        sz = start
        i = 0
        while sz > self.end_sz:
            x = nn.Conv(_NFC_MIDAS[sz // 2], (4, 4), strides=2, padding=1,
                        use_bias=False, name=f"down{i}")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1,
                             name=f"norm{i}")(x)  # instance-style norm
            x = nn.leaky_relu(x, 0.2)
            sz //= 2
            i += 1
        x = nn.Conv(self.out_features, (4, 4), padding="VALID", use_bias=False,
                    name="out_conv")(x)
        return jnp.sum(x, axis=(1, 2))  # [N, out_features]


class MultiSetComparator(nn.Module):
    """Reference-set vs candidate-set scorer: joint multiset encoder →
    pooling → interaction head [ZX | ZY | ZX·ZY] → logit per batch element
    (reference MultiSetModel.forward, set.py:343-374, with the
    discriminator's kwargs — pooling='mean', decoder_layers=0,
    discriminator.py:96-107). Pooling is masked-mean when set masks are
    given (our padded-set extension; the reference pads to fixed sizes)."""

    latent_size: int = 512
    num_heads: int = 4
    num_blocks: int = 2
    pooling: str = "mean"  # 'mean' | 'pma' | 'max'
    decoder_layers: int = 0

    @nn.compact
    def __call__(self, r: jax.Array, x: jax.Array,
                 r_mask: Optional[jax.Array] = None,
                 x_mask: Optional[jax.Array] = None) -> jax.Array:
        masks = None
        if r_mask is not None or x_mask is not None:
            b, rn = r.shape[:2]
            xn = x.shape[1]
            rm = r_mask if r_mask is not None else jnp.ones((b, rn), bool)
            xm = x_mask if x_mask is not None else jnp.ones((b, xn), bool)
            masks = (
                jnp.broadcast_to(rm[:, None, :], (b, rn, rn)),
                jnp.broadcast_to(xm[:, None, :], (b, rn, xn)),
                jnp.broadcast_to(rm[:, None, :], (b, xn, rn)),
                jnp.broadcast_to(xm[:, None, :], (b, xn, xn)),
            )
        r_enc, x_enc = MultiSetTransformerEncoder(
            self.latent_size, self.latent_size, self.latent_size,
            self.latent_size, self.num_heads, self.num_blocks,
            ln=True, name="encoder")(r, x, masks=masks)

        if self.pooling == "pma":
            pool_r = PMA(self.latent_size, self.latent_size, self.num_heads,
                         1, ln=True, name="pool_x")
            pool_x = PMA(self.latent_size, self.latent_size, self.num_heads,
                         1, ln=True, name="pool_y")
            zr = pool_r(r_enc, mask=None if masks is None
                        else masks[0][:, :1])[:, 0]
            zx = pool_x(x_enc, mask=None if masks is None
                        else masks[3][:, :1])[:, 0]
        elif self.pooling == "max":
            zr, zx = jnp.max(r_enc, axis=1), jnp.max(x_enc, axis=1)
        else:

            def pool(v, m):
                if m is None:
                    return jnp.mean(v, axis=1)
                m = m[:, :, None].astype(v.dtype)
                return (jnp.sum(v * m, axis=1)
                        / jnp.maximum(jnp.sum(m, axis=1), 1))

            zr, zx = pool(r_enc, r_mask), pool(x_enc, x_mask)

        out = jnp.concatenate([zr, zx, zr * zx], axis=-1)
        for i in range(self.decoder_layers):  # set.py:328-341 MLP head
            out = nn.Dense(self.latent_size, name=f"head{i}")(out)
            out = nn.relu(out)
        return nn.Dense(1, name="decoder")(out)  # [B, 1]


class MultiScaleD(nn.Module):
    """Per-scale SingleDisc embeddings + set comparison, concatenated."""

    resolutions: Sequence[int]
    latent_size: int = 512
    num_discs: int = 4
    attn_heads: int = 4   # reference --d_attn_heads
    attn_layers: int = 2  # reference --d_attn_layers

    @nn.compact
    def __call__(self, r_features: Dict[str, jax.Array],
                 x_features: Dict[str, jax.Array],
                 r_mask=None, x_mask=None) -> jax.Array:
        logits = []
        for i in range(self.num_discs):
            k = str(i)
            rf, xf = r_features[k], x_features[k]  # [B, S, h, w, c]
            b = rf.shape[0]
            disc = SingleDisc(self.resolutions[i],
                              out_features=self.latent_size, name=f"disc{i}")
            r_enc = to_set(disc(to_images(rf)), b)
            x_enc = to_set(disc(to_images(xf)), b)
            score = MultiSetComparator(
                self.latent_size, num_heads=self.attn_heads,
                num_blocks=self.attn_layers, name=f"set{i}")(
                r_enc, x_enc, r_mask=r_mask, x_mask=x_mask)
            logits.append(score)
        return jnp.concatenate(logits, axis=1)  # [B, num_discs]


class ProjectedSetDiscriminator(nn.Module):
    """DiffAugment candidates, normalize, extract+project features per
    backbone, compare reference/candidate sets at every scale."""

    latent_size: int = 512
    num_discs: int = 4
    diffaug: bool = True
    interp224: bool = True
    backbones: Tuple[str, ...] = ("vgg16_proj",)
    attn_heads: int = 4
    attn_layers: int = 2
    remat_features: bool = False  # remat the frozen trunks (see FeatureProjector)

    @nn.compact
    def __call__(self, r: jax.Array, x: jax.Array,
                 rng: Optional[jax.Array] = None,
                 r_mask=None, x_mask=None, train: bool = False,
                 ada_p: Optional[jax.Array] = None) -> jax.Array:
        """r: [B, R, H, W, 3]; x: [B, C, H, W, 3] in [-1, 1] → logits
        [B, num_backbones × num_discs].

        ``ada_p``: optional traced scalar ∈ [0, 1] — per-image probability of
        applying DiffAugment to the candidates (ADA; reference
        setgan/training_loop.py:482-486 adapts this p). None keeps the
        projected-GAN default of unconditional DiffAugment.
        """
        b, rs = r.shape[:2]
        cs = x.shape[1]
        x_flat, r_flat = to_images(x), to_images(r)

        all_logits = []
        for bb in self.backbones:
            if self.diffaug and rng is not None:
                x_aug = diff_augment(rng, x_flat)
                if ada_p is not None:
                    keep = jax.random.uniform(
                        jax.random.fold_in(rng, 17),
                        (x_flat.shape[0], 1, 1, 1)) < ada_p
                    x_aug = jnp.where(keep, x_aug, x_flat)
            else:
                x_aug = x_flat
            r_aug = r_flat

            _, mean, std = resolve_backbone(bb)

            def norm(v):
                v = (v + 1) / 2
                return (v - mean) / std

            x_n, r_n = norm(x_aug), norm(r_aug)
            fixed = backbone_fixed_res(bb)
            in_res = x.shape[2]
            if self.interp224 or fixed is not None:
                in_res = 224 if self.interp224 else fixed
                x_n = resize_bilinear(x_n, in_res)
                r_n = resize_bilinear(r_n, in_res)

            proj = FeatureProjector(backbone=bb, remat=self.remat_features,
                                    name=f"proj_{bb}")
            x_feats = {k: to_set(v, b) for k, v in proj(x_n).items()}
            r_feats = {k: to_set(v, b) for k, v in proj(r_n).items()}
            # stage-0 resolution: /2 for the VGG/tiny stacks, /4 for
            # DeiT/EffNet (registry backbones).
            res0 = in_res // _FIRST_STAGE_STRIDE.get(bb, 4)
            resolutions = [res0 // (2 ** i) for i in range(4)]
            logits = MultiScaleD(resolutions, self.latent_size,
                                 self.num_discs, attn_heads=self.attn_heads,
                                 attn_layers=self.attn_layers,
                                 name=f"d_{bb}")(
                r_feats, x_feats, r_mask=r_mask, x_mask=x_mask)
            all_logits.append(logits)
        return jnp.concatenate(all_logits, axis=1)


def projector_param_mask(params: dict) -> dict:
    """True for trainable leaves; the frozen projector (backbone + random
    CCM/CSM) is excluded, matching projected-GAN's frozen feature nets."""
    import jax

    def mask_subtree(path_keys, leaf):
        return not any(str(k).startswith("proj_") for k in path_keys)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [mask_subtree([getattr(k, "key", k) for k in path], v)
              for path, v in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
