"""Canonical recipe scripts run end-to-end in smoke mode (CPU mesh).

The reference ships its published hyperparameters as runnable scripts
(/root/reference/scripts/train_setgan_{stem,superres,pretrained}.sh:35-66,
train.sh:15-37); these tests run our equivalents with SG3TPU_SMOKE=1 —
tiny nets, 2-device CPU mesh, one optimizer step — proving each recipe is
actually executable, not just documented.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def class_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("recipe_ds")
    rng = np.random.RandomState(0)
    for cls in ("a", "b", "c"):
        d = root / cls
        d.mkdir()
        for i in range(5):
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            ).save(d / f"{i}.png")
    return root


def _run(script, args, cwd, extra_env=None):
    env = dict(os.environ, SG3TPU_SMOKE="1", JAX_PLATFORMS="cpu",
               OUTDIR=str(cwd / "training-runs"))
    env.pop("XLA_FLAGS", None)  # the scripts set their own device count
    env.update(extra_env or {})
    r = subprocess.run(["bash", str(REPO / "scripts" / script), *args],
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1500)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    return r


@pytest.mark.slow
def test_stem_recipe_smoke(class_dataset, tmp_path):
    r = _run("train_setgan_stem.sh", ["32", str(class_dataset), "smoke"],
             cwd=tmp_path)
    assert "done at" in r.stdout
    assert (tmp_path / "training-runs" / "smoke_32" / "final.json").exists()


@pytest.mark.slow
def test_superres_recipe_smoke(class_dataset, tmp_path):
    # '-' = train a one-step stem first, then grow it ×2 and train the head.
    r = _run("train_setgan_superres.sh",
             ["64", str(class_dataset), "smoke", "-"], cwd=tmp_path)
    assert "done at" in r.stdout
    assert (tmp_path / "training-runs" / "smoke_64" / "final.json").exists()


@pytest.mark.slow
def test_pretrained_recipe_smoke(class_dataset, tmp_path):
    r = _run("train_setgan_pretrained.sh",
             ["32", str(class_dataset), "smoke", "-"], cwd=tmp_path)
    assert "done at" in r.stdout


@pytest.mark.slow
def test_e4e_recipe_smoke(tmp_path):
    from PIL import Image

    data = tmp_path / "faces"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)
                        ).save(data / f"{i}.png")
    r = _run("train_e4e.sh", ["smoke", "-", str(data)], cwd=tmp_path)
    assert "done:" in r.stdout
