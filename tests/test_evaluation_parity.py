"""Differential lock: our vectorized evaluator == reference benchmark/ evaluator.

Builds a synthetic val split (3 scenes, noisy estimates, missing frames, one
scene absent from the submission, tied confidences) and compares every
official protocol number and the P/R curves between
``mickey_tpu.evaluation.evaluate`` and the reference ``benchmark.mapfree``
(imported from /root/reference with transforms3d + yacs stubs).
"""

import sys
import types
import zipfile
from pathlib import Path

import numpy as np
import pytest

import mickey_tpu.geometry.rotations as _rot
from mickey_tpu.evaluation import evaluate

# -- stub transforms3d + yacs-backed config before importing reference code --
_t3d = types.ModuleType("transforms3d")
_t3d_quat = types.ModuleType("transforms3d.quaternions")
for _n in ("quat2mat", "mat2quat", "qinverse", "qmult", "rotate_vector"):
    setattr(_t3d_quat, _n, getattr(_rot, _n))
_t3d.quaternions = _t3d_quat
sys.modules.setdefault("transforms3d", _t3d)
sys.modules.setdefault("transforms3d.quaternions", _t3d_quat)

_cfgmod = types.ModuleType("config")
_cfgdef = types.ModuleType("config.default")
_cfgdef.cfg = types.SimpleNamespace(DATASET=types.SimpleNamespace(DATA_ROOT=""))
_cfgmod.default = _cfgdef
sys.modules.setdefault("config", _cfgmod)
sys.modules.setdefault("config.default", _cfgdef)

sys.path.insert(0, "/root/reference")

ref_mapfree = pytest.importorskip("benchmark.mapfree")


def _rand_unit_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


@pytest.fixture(scope="module")
def synthetic_eval_case(tmp_path_factory):
    """(dataset_split_dir, submission_zip) with GT poses + noisy estimates."""
    root = tmp_path_factory.mktemp("mapfree_eval") / "val"
    rng = np.random.default_rng(7)
    n_frames = 23
    sub_rows = {}

    for scene in ("s00000", "s00001", "s00002"):
        sdir = root / scene
        sdir.mkdir(parents=True)
        # seq0 anchor frame shares frame number 0 with seq1/frame_00000 and
        # has DIFFERENT intrinsics: the reference's frame-number-keyed dicts
        # keep the LAST occurrence (the seq1 query), so must we
        poses = ["seq0/frame_00000.jpg 1.0 0.0 0.0 0.0 0.0 0.0 0.0"]
        intr = ["seq0/frame_00000.jpg 999.0 999.0 111.0 222.0 540 720"]
        est_lines = []
        for i in range(n_frames):
            name = f"seq1/frame_{i:05}.jpg"
            q = _rand_unit_quat(rng)
            t = rng.normal(size=3)
            poses.append(f"{name} " + " ".join(f"{v:.9f}" for v in [*q, *t]))
            intr.append(f"{name} 520.0 520.0 270.0 360.0 540 720")

            # estimates: noisy pose; drop some frames; tie some confidences
            if i % 7 == 3:
                continue
            qe = _rand_unit_quat(rng) * 0.05 + q
            te = t + rng.normal(size=3) * 0.15
            conf = round(float(rng.uniform(0, 10)), 1) if i % 3 else 5.0
            est_lines.append(
                f"{name} " + " ".join(f"{v:.9f}" for v in [*qe, *te]) + f" {conf}"
            )
        (sdir / "poses.txt").write_text("\n".join(poses) + "\n")
        (sdir / "intrinsics.txt").write_text("\n".join(intr) + "\n")
        if scene != "s00002":  # one scene entirely missing from the submission
            sub_rows[scene] = "\n".join(est_lines) + "\n"

    zip_path = root.parent / "submission.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for scene, text in sub_rows.items():
            zf.writestr(f"pose_{scene}.txt", text)
    return root, zip_path


def test_evaluator_matches_reference(synthetic_eval_case):
    split_dir, zip_path = synthetic_eval_case

    ours, our_curves = evaluate(zip_path, split_dir)

    scenes = [f.name for f in Path(split_dir).iterdir() if f.is_dir()]
    all_results, failures = {}, 0
    with zipfile.ZipFile(zip_path) as zf:
        for scene in scenes:
            res, fail = ref_mapfree.compute_scene_metrics(Path(split_dir), zf, scene)
            all_results[scene] = res
            failures += fail
    theirs, their_curves = ref_mapfree.aggregate_results(all_results, failures)

    assert set(ours.keys()) == set(theirs.keys())
    for key in theirs:
        np.testing.assert_allclose(ours[key], theirs[key], rtol=1e-6, atol=1e-9, err_msg=key)
    for key in their_curves:
        np.testing.assert_allclose(
            np.asarray(our_curves[key], float),
            np.asarray(their_curves[key], float),
            rtol=1e-6,
            atol=1e-9,
            err_msg=key,
        )
