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
