"""Checkpoint/resume, debug instrumentation, timing harness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_renderer_tpu.utils.checkpoint import (
    export_mesh_snapshot,
    load_checkpoint,
    save_checkpoint,
)
from torch_renderer_tpu.utils.debug import anomaly_detection, checked
from torch_renderer_tpu.utils.timing import StageTimer, time_fn


def test_checkpoint_roundtrip_params_and_optstate(tmp_path):
    params = {"t": jnp.asarray([1.0, 2.0, 3.0]), "quat": jnp.asarray([1.0, 0, 0, 0])}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # take one step so the state is non-trivial
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    up, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, up)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, (params, opt_state), step=7)

    params0 = {"t": jnp.zeros(3), "quat": jnp.zeros(4)}
    like = (params0, tx.init(params0))
    (rp, rs), step = load_checkpoint(path, like)
    assert step == 7
    np.testing.assert_allclose(rp["t"], np.asarray(params["t"]))
    # resumed opt state continues identically
    up1, s1 = tx.update(g, rs, rp)
    up2, s2 = tx.update(g, opt_state, params)
    np.testing.assert_allclose(np.asarray(up1["t"]), np.asarray(up2["t"]), atol=1e-7)


def test_mesh_snapshot_export(tmp_path):
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.structures.meshes import Meshes

    verts, faces = icosphere(0)
    m = Meshes.from_single(verts, faces)
    path = str(tmp_path / "snap.obj")
    export_mesh_snapshot(path, m)
    from torch_renderer_tpu.io.obj import load_obj

    back = load_obj(path, load_textures=False)
    np.testing.assert_allclose(back.verts, verts, atol=1e-5)


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(bad)
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_anomaly_detection_restores_flags():
    before = jax.config.jax_debug_nans
    with anomaly_detection():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before


def test_time_fn_and_stage_timer():
    f = jax.jit(lambda x: x * 2.0)
    r = time_fn(f, jnp.ones((8, 8)), reps=3, name="double")
    assert r.mean_s > 0 and r.reps == 3
    t = StageTimer()
    with t.stage("a"):
        pass
    assert "a" in t.stages and "total" in t.report()


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from torch_renderer_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    path = str(tmp_path / "ck_orbax")
    save_checkpoint_orbax(path, tree)
    like = {"w": jnp.zeros((2, 3)), "b": jnp.zeros(3)}
    back = load_checkpoint_orbax(path, like)
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(tree["w"]))
