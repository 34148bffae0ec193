"""Smoke tests: attribute scorers, MTCNN stages, runtime utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.editing.attribute_scorers import (
    AgeEstimator,
    AttributeClassifier,
    CELEBA_ATTRIBUTES,
    PoseEstimator,
)
from stylegan3_editing_tpu.models.mtcnn import (
    MTCNN,
    PNet,
    calibrate_box,
    convert_to_square,
    nms,
)
from stylegan3_editing_tpu.runtime import EasyDict, construct_class_by_name, format_time
from stylegan3_editing_tpu.runtime.training_stats import StatsCollector
from stylegan3_editing_tpu.utils.train_utils import aggregate_loss_dict, vis_faces

RNG = np.random.RandomState(0)


def test_age_estimator_shapes():
    m = AgeEstimator()
    x = jnp.asarray(RNG.randn(2, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ages = m.apply(v, x)
    assert ages.shape == (2,)
    assert bool(((ages >= 0) & (ages <= 100)).all())


def test_pose_estimator_shapes():
    m = PoseEstimator()
    x = jnp.asarray(RNG.randn(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert set(out) == {"yaw", "pitch", "roll"}
    for angle in out.values():
        assert -99 <= float(angle[0]) <= 99


def test_attribute_classifier_shapes():
    m = AttributeClassifier()
    x = jnp.asarray(RNG.randn(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == (1, len(CELEBA_ATTRIBUTES))


def test_mtcnn_box_utils():
    boxes = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # heavy overlap → suppressed
        [50, 50, 60, 60, 0.7],
    ], np.float32)
    keep = nms(boxes, 0.5)
    assert 0 in keep and 2 in keep and 1 not in keep

    squares = convert_to_square(np.array([[0, 0, 20, 10, 0.5]], np.float32))
    w = squares[0, 2] - squares[0, 0]
    h = squares[0, 3] - squares[0, 1]
    assert w == h

    cal = calibrate_box(np.array([[0, 0, 10, 10, 1.0]], np.float32),
                        np.array([[0.1, 0.1, -0.1, -0.1]], np.float32))
    assert cal[0, 0] > 0 and cal[0, 2] < 10


def test_mtcnn_detector_runs():
    det = MTCNN()  # random weights: exercises the staged pipeline
    img = RNG.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes, landmarks = det.detect(img, min_face_size=20)
    assert boxes.shape[1] == 5 and landmarks.shape[1] == 10


# ------------------------------------------------- 5-point alignment warp

def _load_reference_cp2tform():
    """Import the reference's numpy-only cp2tform module as the oracle."""
    import importlib.util
    from pathlib import Path

    path = Path("/root/reference/models/setgan/encoder/mtcnn/mtcnn_pytorch"
                "/src/matlab_cp2tform.py")
    if not path.exists():
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_cp2tform", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_similarity_transform_matches_reference():
    from stylegan3_editing_tpu.models.mtcnn import (
        get_similarity_transform, get_similarity_transform_cv2)

    ref = _load_reference_cp2tform()
    for seed in range(5):
        rng = np.random.RandomState(seed)
        src = rng.uniform(20, 200, size=(5, 2))
        dst = rng.uniform(20, 200, size=(5, 2))
        for reflective in (True, False):
            t_ours, tinv_ours = get_similarity_transform(
                src, dst, reflective=reflective)
            # The reference solver mutates its inputs in place — hand it
            # copies so each oracle call sees fresh points.
            t_ref, tinv_ref = ref.get_similarity_transform(
                src.copy(), dst.copy(), reflective=reflective)
            np.testing.assert_allclose(t_ours, t_ref, atol=1e-10)
            np.testing.assert_allclose(tinv_ours, tinv_ref, atol=1e-10)
        cv2_ours = get_similarity_transform_cv2(src, dst)
        cv2_ref = ref.get_similarity_transform_for_cv2(src.copy(),
                                                       dst.copy())
        np.testing.assert_allclose(cv2_ours, cv2_ref, atol=1e-10)


def test_reference_facial_points_geometry():
    from stylegan3_editing_tpu.models.mtcnn import (
        DEFAULT_CROP_SIZE, REFERENCE_FACIAL_POINTS,
        get_reference_facial_points)

    # default: the canonical (96, 112) template unchanged
    np.testing.assert_allclose(get_reference_facial_points(),
                               REFERENCE_FACIAL_POINTS)
    # default_square pads x by (112-96)/2 = 8, y unchanged
    # (align_trans.py:81-85)
    sq = get_reference_facial_points(default_square=True)
    np.testing.assert_allclose(sq[:, 0], REFERENCE_FACIAL_POINTS[:, 0] + 8)
    np.testing.assert_allclose(sq[:, 1], REFERENCE_FACIAL_POINTS[:, 1])
    assert DEFAULT_CROP_SIZE == (96, 112)


def test_warp_and_crop_face_protocol():
    from stylegan3_editing_tpu.models.mtcnn import (
        get_reference_facial_points, get_similarity_transform_cv2,
        warp_affine, warp_and_crop_face)

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
    # plausible 5-point layout (eyes, nose, mouth corners) in image coords
    pts = np.array([[90.0, 100.0], [160.0, 98.0], [125.0, 140.0],
                    [100.0, 180.0], [155.0, 178.0]])
    ref_pts = get_reference_facial_points(default_square=True)
    face, tfm = warp_and_crop_face(img, pts, ref_pts, crop_size=(112, 112))
    assert face.shape == (112, 112, 3) and face.dtype == np.uint8
    assert tfm.shape == (2, 3)
    # the transform maps the landmarks close to the reference template
    mapped = (np.hstack([pts, np.ones((5, 1))]) @ tfm.T)
    assert float(np.abs(mapped - ref_pts).mean()) < 6.0
    # 2xK point layout accepted like the reference (align_trans.py:268-278)
    face_t, tfm_t = warp_and_crop_face(img, pts.T, ref_pts,
                                       crop_size=(112, 112))
    np.testing.assert_array_equal(face, face_t)

    # the numpy warp fallback matches cv2.warpAffine within interpolation
    # rounding (cv2 uses 5-bit fixed-point bilinear weights)
    cv2 = pytest.importorskip("cv2")
    m = get_similarity_transform_cv2(pts, ref_pts)
    ours_cv = warp_affine(img, m, (112, 112))
    theirs = cv2.warpAffine(img, m, (112, 112))
    np.testing.assert_array_equal(ours_cv, theirs)  # warp_affine uses cv2

    import stylegan3_editing_tpu.models.mtcnn as mtcnn_mod
    src = np.asarray(img, np.float64)
    full = np.vstack([m, [0, 0, 1.0]])
    # exercise the pure-numpy path by temporarily hiding cv2
    import builtins
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("hidden for test")
        return real_import(name, *a, **k)

    builtins.__import__ = no_cv2
    try:
        ours_np = mtcnn_mod.warp_affine(img, m, (112, 112))
    finally:
        builtins.__import__ = real_import
    assert int(np.abs(ours_np.astype(int) - theirs.astype(int)).max()) <= 2


def test_mtcnn_npy_converter_structure_and_flatten_order():
    import jax.tree_util as jtu
    from stylegan3_editing_tpu.models.mtcnn import (ONet, RNet,
                                                    convert_mtcnn_npy)

    rng = np.random.RandomState(3)

    def t_conv(cin, cout, k):
        return rng.randn(cout, cin, k, k).astype(np.float32)

    def fake(tmpl):  # build a torch-named .npy-style dict
        return {k: (rng.randn(*v).astype(np.float32)
                    if isinstance(v, tuple) else v) for k, v in tmpl.items()}

    pnet_d = {"features.conv1.weight": t_conv(3, 10, 3),
              "features.conv1.bias": (10,), "features.prelu1.weight": (10,),
              "features.conv2.weight": t_conv(10, 16, 3),
              "features.conv2.bias": (16,), "features.prelu2.weight": (16,),
              "features.conv3.weight": t_conv(16, 32, 3),
              "features.conv3.bias": (32,), "features.prelu3.weight": (32,),
              "conv4_1.weight": t_conv(32, 2, 1), "conv4_1.bias": (2,),
              "conv4_2.weight": t_conv(32, 4, 1), "conv4_2.bias": (4,)}
    rnet_d = {"features.conv1.weight": t_conv(3, 28, 3),
              "features.conv1.bias": (28,), "features.prelu1.weight": (28,),
              "features.conv2.weight": t_conv(28, 48, 3),
              "features.conv2.bias": (48,), "features.prelu2.weight": (48,),
              "features.conv3.weight": t_conv(48, 64, 2),
              "features.conv3.bias": (64,), "features.prelu3.weight": (64,),
              "features.conv4.weight": (128, 576),
              "features.conv4.bias": (128,),
              "features.prelu4.weight": (128,),
              "conv5_1.weight": (2, 128), "conv5_1.bias": (2,),
              "conv5_2.weight": (4, 128), "conv5_2.bias": (4,)}
    onet_d = {"features.conv1.weight": t_conv(3, 32, 3),
              "features.conv1.bias": (32,), "features.prelu1.weight": (32,),
              "features.conv2.weight": t_conv(32, 64, 3),
              "features.conv2.bias": (64,), "features.prelu2.weight": (64,),
              "features.conv3.weight": t_conv(64, 64, 3),
              "features.conv3.bias": (64,), "features.prelu3.weight": (64,),
              "features.conv4.weight": t_conv(64, 128, 2),
              "features.conv4.bias": (128,),
              "features.prelu4.weight": (128,),
              "features.conv5.weight": (256, 1152),
              "features.conv5.bias": (256,),
              "features.prelu5.weight": (256,),
              "conv6_1.weight": (2, 256), "conv6_1.bias": (2,),
              "conv6_2.weight": (4, 256), "conv6_2.bias": (4,),
              "conv6_3.weight": (10, 256), "conv6_3.bias": (10,)}

    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for name, d in [("pnet", fake(pnet_d)), ("rnet", fake(rnet_d)),
                        ("onet", fake(onet_d))]:
            p = Path(td) / f"{name}.npy"
            np.save(p, np.array(d, dtype=object))
            paths.append(p)
        pv, rv, ov = convert_mtcnn_npy(*paths)

    det = MTCNN()  # random-init reference structure
    for ours, init in [(pv, det.pnet_vars), (rv, det.rnet_vars),
                       (ov, det.onet_vars)]:
        got = jtu.tree_map(lambda a: a.shape, ours)
        want = jtu.tree_map(lambda a: a.shape, init)
        assert got == want
    # converted weights drive the staged pipeline
    det2 = MTCNN(pv, rv, ov)
    img = RNG.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes, lms = det2.detect(img, min_face_size=20)
    assert boxes.shape[1] == 5 and lms.shape[1] == 10

    # flatten-order check: the reference flattens NCHW maps as (c, w, h)
    # (get_nets.py:29); our RNet/ONet flatten as (c, h, w). The converter's
    # column permutation must make both produce identical dense outputs.
    torch = pytest.importorskip("torch")
    feat = rng.randn(1, 64, 3, 3).astype(np.float32)  # NCHW map pre-flatten
    w = rnet_d["features.conv4.weight"]
    wt = torch.from_numpy(rng.randn(*w).astype(np.float32))
    ref_flat = torch.from_numpy(feat).transpose(3, 2).contiguous().view(1, -1)
    ref_out = (ref_flat @ wt.T).numpy()
    # our flatten order: (c, h, w)
    ours_flat = feat.reshape(1, -1)
    # the converter's dense() permutation applied to the same weights
    kern = wt.numpy().reshape(128, 64, 3, 3).transpose(0, 1, 3, 2) \
        .reshape(128, -1).T
    ours_out = ours_flat @ kern
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-5, atol=1e-5)


def test_mtcnn_align_api():
    det = MTCNN()  # random weights
    img = RNG.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    face, tfm = det.align(img)
    if face is not None:  # random weights may or may not "detect" a face
        assert face.shape == (112, 112, 3) and tfm.shape == (2, 3)
    boxes, faces, tfms = det.align_multi(img, limit=2, min_face_size=20)
    assert len(faces) == len(tfms)
    for f in faces:
        assert f.shape == (112, 112, 3)


def test_runtime_utils():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    assert format_time(75) == "1m 15s"
    obj = construct_class_by_name(
        class_name="stylegan3_editing_tpu.runtime.util.EasyDict", a=3)
    assert obj.a == 3

    stats = StatsCollector()
    stats.report("loss", np.array([1.0, 3.0]))
    stats.report("loss", 2.0)
    assert stats.num("loss") == 3
    assert stats.mean("loss") == pytest.approx(2.0)
    assert stats.std("loss") == pytest.approx(np.std([1, 3, 2]))


def test_train_utils():
    agg = aggregate_loss_dict([{"l2": 1.0}, {"l2": 3.0, "id": 2.0}])
    assert agg["l2"] == 2.0 and agg["id"] == 2.0
    im = RNG.rand(16, 16, 3).astype(np.float32) * 2 - 1
    grid = vis_faces([{"input_face": im, "target_face": im,
                       "output_face": [(im, "x")], "sim": 0.5}], cell=32)
    assert grid.size == (3 * 32, 32)


def test_conditional_metrics_registry():
    from stylegan3_editing_tpu.setgan.metrics import ConditionalMetrics

    cm = ConditionalMetrics(lambda imgs: imgs.reshape(imgs.shape[0], -1)[:, :6])
    cm.add_split("val", {0: RNG.randn(64, 2, 2, 2),
                         1: RNG.randn(64, 2, 2, 2)})
    cm.add_metric("fid_agg", "agg")
    cm.add_metric("fid_s", "sfid")
    out = cm.report_metrics("val", lambda cls, n: RNG.randn(n, 2, 2, 2) + 0.3)
    assert set(out) == {"fid_agg", "fid_s"}
    assert all(np.isfinite(v) and v > 0 for v in out.values())


def test_fid_real_stats_cache(tmp_path):
    """Second eval of the same split loads cached real moments instead of
    re-featurizing the dataset (reference metric_utils.py:374-402)."""
    from stylegan3_editing_tpu.setgan.metrics import (ConditionalMetrics,
                                                      stats_cache_file)

    calls = {"real": 0}
    real_ids = set()

    def feature_fn(imgs):
        if id(imgs) in real_ids:
            calls["real"] += 1
        return imgs.reshape(imgs.shape[0], -1)[:, :6]

    real = {0: RNG.randn(64, 2, 2, 2), 1: RNG.randn(64, 2, 2, 2)}
    real_ids.update(id(v) for v in real.values())
    rng_fake = np.random.RandomState(7)

    def gen(cls, n):
        return rng_fake.randn(n, 2, 2, 2) + 0.3

    cm = ConditionalMetrics(feature_fn, cache_dir=tmp_path,
                            detector_name="toy")
    cm.add_split("val", real, config={"resolution": 2, "seed": 0})
    cm.add_metric("fid_agg", "agg")
    v1 = cm.calc_metric("fid_agg", "val", gen)
    assert calls["real"] == 2  # both classes featurized once
    cache = stats_cache_file(tmp_path, "val", "toy",
                             {"resolution": 2, "seed": 0,
                              "max_items_per_class": None})
    assert cache.exists()

    rng_fake.seed(7)  # same fakes → identical metric from cached moments
    v2 = cm.calc_metric("fid_agg", "val", gen)
    assert calls["real"] == 2  # cache hit: real side NOT recomputed
    assert v2 == pytest.approx(v1, rel=1e-9)

    # a config change invalidates the key (fresh digest → recompute)
    cm.add_split("val", real, config={"resolution": 4, "seed": 0})
    rng_fake.seed(7)
    cm.calc_metric("fid_agg", "val", gen)
    assert calls["real"] == 4


def test_profiling_scopes_and_trace(tmp_path):
    """profiled_scope accumulates host times; jax.profiler trace capture
    lands a profile dump (reference misc.profiled_function analogue,
    torch_utils/misc.py:102-110)."""
    import jax.numpy as jnp

    from stylegan3_editing_tpu.runtime.profiling import (
        drain_scope_times, maybe_start_trace, profiled_function,
        profiled_scope, stop_trace)

    assert maybe_start_trace(str(tmp_path / "trace"))
    with profiled_scope("phase_a"):
        jnp.square(jnp.arange(8)).block_until_ready()

    @profiled_function
    def work():
        return jnp.sum(jnp.ones((4, 4)))

    work()
    out = stop_trace()
    assert out is not None
    times = drain_scope_times()
    assert "phase_a" in times and times["phase_a"] > 0
    assert any(k.endswith("work") for k in times)
    assert drain_scope_times() == {}  # drained
    import pathlib
    dumped = list(pathlib.Path(out).rglob("*"))
    assert dumped, "no trace files written"
