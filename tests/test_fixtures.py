"""Recorded sensor-data fixture ingestion tests (filtered_datas.pkl format)."""

import numpy as np

from torch_renderer_tpu.io.fixtures import load_recorded_frames, save_recorded_frames


def test_recorded_frames_roundtrip_and_chain(tmp_path):
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, 3] = rng.standard_normal(3)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * i, 0, 0.5]
        frames.append({
            "object_id": i,
            "object_pose": pose,
            "extrinsic": ext,
            "intrinsic": np.diag([100.0, 100.0, 1.0]).astype(np.float32),
            "rendered_depth": rng.uniform(0, 2, (18, 32)).astype(np.float32),
        })
    path = str(tmp_path / "rec.pkl")
    save_recorded_frames(path, frames)
    out = load_recorded_frames(path)

    assert out["K"].shape == (3, 3, 3)
    assert out["depth"].shape == (3, 18, 32)
    assert list(out["object_id"]) == [0, 1, 2]
    # camera chain = extrinsic @ object_pose (pose_optimizer.py:91)
    want = frames[1]["extrinsic"] @ frames[1]["object_pose"]
    np.testing.assert_allclose(out["R"][1], want[:3, :3], atol=1e-6)
    np.testing.assert_allclose(out["t"][1], want[:3, 3], atol=1e-6)
