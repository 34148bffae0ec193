"""Top-level alias-free generator: mapping + synthesis.

Parity: reference `Generator`
(/root/reference/models/stylegan3/networks_stylegan3.py:531-554). Functional
API: `Generator.init` builds {'params', 'buffers', 'ema'} collections;
training passes ``update_emas=True`` with ``mutable=['ema']``.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import flax.linen as nn
import jax

from .config import SG3Config
from .layers import MappingNetwork
from .synthesis import SynthesisNetwork


class Generator(nn.Module):
    cfg: SG3Config

    def setup(self):
        cfg = self.cfg
        self.synthesis = SynthesisNetwork(cfg)
        self.mapping = MappingNetwork(
            z_dim=cfg.z_dim,
            c_dim=cfg.c_dim,
            w_dim=cfg.w_dim,
            num_ws=cfg.num_ws,
            num_layers=cfg.mapping_layers,
            lr_multiplier=cfg.mapping_lr_multiplier,
            w_avg_beta=cfg.w_avg_beta,
        )

    @property
    def num_ws(self) -> int:
        return self.cfg.num_ws

    def __call__(
        self,
        z: jax.Array,
        c: Optional[jax.Array] = None,
        truncation_psi: Union[float, jax.Array] = 1.0,
        truncation_cutoff: Optional[int] = None,
        transform: Optional[jax.Array] = None,
        force_fp32: bool = False,
        update_emas: bool = False,
    ) -> jax.Array:
        """z → NHWC image in [-1, 1] (fp32)."""
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas)
        return self.synthesis(ws, transform=transform, force_fp32=force_fp32,
                              update_emas=update_emas)

    def map(
        self,
        z: jax.Array,
        c: Optional[jax.Array] = None,
        truncation_psi: Union[float, jax.Array] = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_emas: bool = False,
    ) -> jax.Array:
        """z → W+ latents ``[N, num_ws, w_dim]``."""
        return self.mapping(z, c, truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff,
                            update_emas=update_emas)

    def synthesize(
        self,
        ws: jax.Array,
        transform: Optional[jax.Array] = None,
        all_s: Optional[Dict[str, jax.Array]] = None,
        force_fp32: bool = False,
        update_emas: bool = False,
    ) -> jax.Array:
        """W+ (or StyleSpace ``all_s``) → NHWC image."""
        return self.synthesis(ws, transform=transform, all_s=all_s,
                              force_fp32=force_fp32, update_emas=update_emas)

    def w2s(self, ws: jax.Array) -> Dict[str, jax.Array]:
        """W+ → StyleSpace dict (fork's `W2S`)."""
        return self.synthesis.w2s(ws)
