"""Class-conditional FID for SetGAN evaluation.

Parity: reference setgan/metrics.py (`FID` with sfid/rfid/aggregate modes
:28-76) and setgan/metric_utils.py (`FeatureStats`/`FeatureStatsByClass`
with cross-rank gather :122-246, per-class reference/eval splits :270-295).

The feature extractor is pluggable (the reference uses NVIDIA's InceptionV3
TorchScript pickle; here any `features(x_nhwc) -> [N, D]` callable works —
this repo's ResNet-50 with converted weights, or a converted Inception).
Cross-host reduction: feature moments accumulate locally and sum via
`psum_moments`-style allreduce when run under pjit.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import numpy as np


class FeatureStats:
    """Streaming mean/covariance accumulator over feature batches."""

    def __init__(self, dim: Optional[int] = None, max_items: Optional[int] = None):
        self.dim = dim
        self.max_items = max_items
        self.num = 0
        self._sum = None
        self._outer = None
        self._synced = False

    def _init_zero(self, dim: int):
        """Allocate zero moments (for classes another host saw first)."""
        self.dim = dim
        self._sum = np.zeros(dim)
        self._outer = np.zeros((dim, dim))

    def append(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        if self.max_items is not None and self.num >= self.max_items:
            return
        if self.max_items is not None:
            feats = feats[:self.max_items - self.num]
        if self._sum is None:
            self.dim = feats.shape[1]
            self._sum = np.zeros(self.dim)
            self._outer = np.zeros((self.dim, self.dim))
        self._sum += feats.sum(axis=0)
        self._outer += feats.T @ feats
        self.num += feats.shape[0]

    def get_mean_cov(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.num > 1, "need at least 2 samples"
        mu = self._sum / self.num
        cov = self._outer / self.num - np.outer(mu, mu)
        return mu, cov

    def sync_across_hosts(self) -> "FeatureStats":
        """Sum the accumulated moments over all JAX processes.

        TPU-native equivalent of the reference's cross-rank feature gather
        (metric_utils.py:162-173 `append_torch` all_gather): instead of
        gathering raw features, the sufficient statistics (count, Σx, Σxxᵀ)
        are all-reduced once — O(D²) traffic instead of O(N·D). No-op in a
        single-process run. Idempotent: a second call (e.g. compute('agg')
        then compute('sfid')) must not re-sum already-summed statistics."""
        import jax

        if jax.process_count() == 1 or self._sum is None or self._synced:
            return self
        self._synced = True
        from jax.experimental import multihost_utils

        packed = np.concatenate(
            [np.array([self.num], np.float64), self._sum,
             self._outer.reshape(-1)])
        gathered = np.asarray(
            multihost_utils.process_allgather(packed))  # [P, ...]
        total = gathered.sum(axis=0)
        self.num = int(total[0])
        self._sum = total[1:1 + self.dim]
        self._outer = total[1 + self.dim:].reshape(self.dim, self.dim)
        return self


def stats_cache_file(cache_dir, dataset_name: str, detector_name: str,
                     config: Optional[dict] = None) -> Path:
    """Digest-keyed cache path for a dataset's real-side feature moments.

    Parity: reference setgan/metric_utils.py:374-402 — cache tag =
    '{dataset}-{detector}-{md5 of the sorted config repr}', so any change
    to the dataset kwargs, detector, or stats options invalidates the entry.
    """
    md5 = hashlib.md5(
        repr(sorted((config or {}).items())).encode("utf-8")).hexdigest()
    return Path(cache_dir) / f"{dataset_name}-{detector_name}-{md5}.npz"


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID between two Gaussians (scipy sqrtm on host).

    Rank-deficient covariances (few samples, near-constant features) can
    abort sqrtm; retry with a diagonal jitter — the standard FID fallback.
    """
    import scipy.linalg

    diff = mu1 - mu2
    try:
        covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
        if not np.isfinite(covmean).all():
            raise np.linalg.LinAlgError("non-finite sqrtm")
        tr_covmean = float(np.trace(np.real(covmean)))
    except (np.linalg.LinAlgError, ValueError):
        # tr sqrtm(AB) = Σ √λ_i(AB) — eigenvalue route survives the
        # rank-deficient cases that abort LAPACK's Schur-based sqrtm.
        evals = np.linalg.eigvals(cov1 @ cov2)
        tr_covmean = float(np.sum(np.sqrt(np.maximum(evals.real, 0.0))))
    return float(diff @ diff + np.trace(cov1 + cov2) - 2 * tr_covmean)


class ConditionalFID:
    """Per-class FID with sfid (mean of per-class FIDs), rfid (FID of class
    means), and aggregate (pooled) modes — metrics.py:28-76."""

    def __init__(self, feature_fn: Callable[[np.ndarray], np.ndarray],
                 max_items_per_class: Optional[int] = None):
        self.feature_fn = feature_fn
        self.max_items = max_items_per_class
        self.real: Dict[int, FeatureStats] = {}
        self.fake: Dict[int, FeatureStats] = {}

    def _append(self, store: Dict[int, FeatureStats], cls: int,
                images: np.ndarray):
        feats = np.asarray(self.feature_fn(images))
        store.setdefault(cls, FeatureStats(max_items=self.max_items)).append(feats)

    def append_real(self, cls: int, images: np.ndarray):
        self._append(self.real, cls, images)

    def append_fake(self, cls: int, images: np.ndarray):
        self._append(self.fake, cls, images)

    # ------------------------------------------- real-stats disk cache

    def save_real_stats(self, path) -> None:
        """Persist the (synced) real-side per-class moments to an npz.

        Parity role: the reference pickles its FeatureStatsByClass to
        dnnlib/gan-metrics/ (metric_utils.py:398-402) so the second eval of
        the same split loads moments instead of re-featurizing the dataset."""
        for cls in sorted(self.real):
            self.real[cls].sync_across_hosts()
        arrays = {}
        for cls, st in self.real.items():
            if st._sum is None:
                continue
            arrays[f"sum_{cls}"] = st._sum
            arrays[f"outer_{cls}"] = st._outer
            arrays[f"num_{cls}"] = np.array(st.num, np.int64)
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, **arrays)
        tmp.replace(path)

    def load_real_stats(self, path) -> bool:
        """Load cached real-side moments; True on hit. Loaded stats are
        globally-synced already, so cross-host sync becomes a no-op."""
        path = Path(path)
        if not path.exists():
            return False
        with np.load(path) as z:
            classes = sorted({int(k.split("_", 1)[1]) for k in z.files})
            for cls in classes:
                st = FeatureStats(max_items=self.max_items)
                st._sum = z[f"sum_{cls}"]
                st._outer = z[f"outer_{cls}"]
                st.num = int(z[f"num_{cls}"])
                st.dim = st._sum.shape[0]
                st._synced = True
                self.real[cls] = st
        return True

    def _sync_stores(self):
        """Cross-host sync over a DETERMINISTIC union of classes.

        Each host may have seen a different class subset; syncing only local
        classes would mismatch collective call counts across hosts and hang
        the allgather. Agree on the union first (allgather of padded class-id
        lists), create zero-stats for locally-missing classes, then sync every
        class in sorted order so all hosts issue identical collectives."""
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            stores = (self.real, self.fake)
            counts = np.array(
                [len(s) for s in stores]
                + [next((st.dim for st in s.values() if st.dim is not None), 0)
                   for s in stores], np.int64)
            all_counts = np.asarray(
                multihost_utils.process_allgather(counts, tiled=False))
            cap = max(1, int(all_counts[:, :2].max()))
            padded = np.full((2, cap), -1, np.int64)
            for i, s in enumerate(stores):
                ids = sorted(s)
                padded[i, :len(ids)] = ids
            all_ids = np.asarray(
                multihost_utils.process_allgather(padded, tiled=False))
            dims = all_counts[:, 2:].max(axis=0)  # per-store feature dim
            for i, store in enumerate(stores):
                union = sorted(int(c) for c in np.unique(all_ids[:, i, :])
                               if c >= 0)
                for cls in union:
                    st = store.setdefault(
                        cls, FeatureStats(max_items=self.max_items))
                    if st._sum is None and dims[i] > 0:
                        st._init_zero(int(dims[i]))
        for store in (self.real, self.fake):
            for cls in sorted(store):
                store[cls].sync_across_hosts()

    def compute(self, mode: str = "agg") -> float:
        self._sync_stores()
        classes = sorted(set(self.real) & set(self.fake))
        assert classes, "no overlapping classes with stats"
        if mode == "sfid":
            fids = []
            for c in classes:
                mu1, c1 = self.real[c].get_mean_cov()
                mu2, c2 = self.fake[c].get_mean_cov()
                fids.append(frechet_distance(mu1, c1, mu2, c2))
            return float(np.mean(fids))
        if mode == "rfid":
            real_means = np.stack([self.real[c].get_mean_cov()[0]
                                   for c in classes])
            fake_means = np.stack([self.fake[c].get_mean_cov()[0]
                                   for c in classes])
            s_r, s_f = FeatureStats(), FeatureStats()
            s_r.append(real_means)
            s_f.append(fake_means)
            return frechet_distance(*s_r.get_mean_cov(), *s_f.get_mean_cov())
        if mode == "agg":  # pooled moments across classes
            s_r, s_f = FeatureStats(), FeatureStats()
            for c in classes:
                # pool raw moments across classes
                s_r.num += self.real[c].num
                s_f.num += self.fake[c].num
                if s_r._sum is None:
                    s_r._sum = np.zeros_like(self.real[c]._sum)
                    s_r._outer = np.zeros_like(self.real[c]._outer)
                    s_f._sum = np.zeros_like(self.fake[c]._sum)
                    s_f._outer = np.zeros_like(self.fake[c]._outer)
                s_r._sum += self.real[c]._sum
                s_r._outer += self.real[c]._outer
                s_f._sum += self.fake[c]._sum
                s_f._outer += self.fake[c]._outer
            return frechet_distance(*s_r.get_mean_cov(), *s_f.get_mean_cov())
        raise ValueError(f"unknown FID mode {mode}")


class ConditionalMetrics:
    """Registry of per-split conditional metrics.

    Parity: setgan/metric_utils.py `ConditionalMetrics`
    (add_split/add_metric/calc_metric/report_metric :420+): named data splits
    (class → reference/eval sets) and named metrics evaluated per split.
    """

    def __init__(self, feature_fn: Callable[[np.ndarray], np.ndarray],
                 cache_dir=None, detector_name: str = "features"):
        self.feature_fn = feature_fn
        self.splits: Dict[str, dict] = {}
        self.metrics: Dict[str, str] = {}
        # Real-side stats cache (reference metric_utils.py:374-402): when
        # cache_dir is set, each split's real moments are computed once and
        # re-loaded (digest-keyed on detector + split config) on every
        # subsequent eval — the repeated in-loop FID ticks stop paying the
        # dataset featurization.
        self.cache_dir = cache_dir
        self.detector_name = detector_name
        self._split_config: Dict[str, dict] = {}

    def add_split(self, name: str, class_to_real: Dict[int, np.ndarray],
                  config: Optional[dict] = None):
        """class id → real image batch (NHWC, [-1, 1]). `config` feeds the
        cache digest (dataset kwargs, resolution, …) — pass anything whose
        change must invalidate cached real stats."""
        self.splits[name] = class_to_real
        self._split_config[name] = dict(config or {})

    def add_metric(self, name: str, mode: str = "agg"):
        assert mode in ("agg", "sfid", "rfid")
        self.metrics[name] = mode

    def _cache_file(self, split: str, per_class: Optional[int]):
        if self.cache_dir is None:
            return None
        config = dict(self._split_config.get(split, {}))
        config["max_items_per_class"] = per_class
        return stats_cache_file(self.cache_dir, split, self.detector_name,
                                config)

    def calc_metric(self, metric: str, split: str, generate_fn,
                    per_class: Optional[int] = None) -> float:
        """generate_fn(cls, count) → fake NHWC batch for that class."""
        mode = self.metrics[metric]
        fid = ConditionalFID(self.feature_fn, max_items_per_class=per_class)
        cache = self._cache_file(split, per_class)
        cached = cache is not None and fid.load_real_stats(cache)
        for cls, real in self.splits[split].items():
            if not cached:
                fid.append_real(cls, real)
            fid.append_fake(cls, generate_fn(cls, len(real)))
        if cache is not None and not cached:
            import jax

            if jax.process_index() == 0:
                fid.save_real_stats(cache)
        return fid.compute(mode)

    def report_metrics(self, split: str, generate_fn) -> Dict[str, float]:
        return {m: self.calc_metric(m, split, generate_fn)
                for m in self.metrics}
