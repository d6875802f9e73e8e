"""Camera-axis model parallelism: a (data, cam) 2-D mesh must produce the
same training step numerics as the plain data-parallel mesh (the camera
gated-sum in Deform3DCrossAttn becomes a GSPMD all-reduce over 'cam';
SURVEY §2.10 — the reference is DP-only, this is the TPU-native extension
it calls out as the natural camera/query-axis sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_detr4d_tpu.config import tiny_test_config
from graph_detr4d_tpu.data.synthetic import synthetic_batch
from graph_detr4d_tpu.models import GraphDETR4D
from graph_detr4d_tpu.parallel import make_mesh, shard_batch, replicate
from graph_detr4d_tpu.parallel.mesh import make_mesh_2d, constrain
from graph_detr4d_tpu.parallel.step import build_train_step, init_state


def _two_steps(mesh, cfg, model, state0, batch_np, rng):
    state = replicate(jax.tree.map(np.asarray, state0), mesh)
    batch = shard_batch(
        {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh
    )
    step = build_train_step(model, cfg, mesh)
    state, metrics = step(state, batch, rng)
    first = {k: float(v) for k, v in metrics.items()}
    state, metrics = step(state, batch, rng)
    second = {k: float(v) for k, v in metrics.items()}
    return first, second


def test_cam_mesh_matches_data_mesh():
    # Comparison is at the loss/grad_norm level: per-parameter updates
    # after AdamW are sign-sensitive for zero-init tensors (update ~
    # +-lr * g/sqrt(g^2)), so cross-partitioning reduction-order noise
    # makes elementwise param comparison meaningless.
    cfg = tiny_test_config()
    model = GraphDETR4D(cfg)
    state0 = init_state(model, cfg, jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, batch_size=4, num_gt=4)
    rng = jax.random.PRNGKey(7)

    m_dp, _ = _two_steps(
        make_mesh(jax.devices()[:4]), cfg, model, state0, batch, rng
    )
    m_2d, m_2d_next = _two_steps(
        make_mesh_2d(jax.devices(), cam=2), cfg, model, state0, batch, rng
    )

    assert np.isfinite(m_2d["loss"])
    assert m_2d["loss"] == pytest.approx(m_dp["loss"], rel=2e-4)
    assert m_2d["grad_norm"] == pytest.approx(m_dp["grad_norm"], rel=2e-3)
    # donated state threads through a second step on the 2-D mesh
    assert np.isfinite(m_2d_next["loss"])


def test_constrain_noop_outside_mesh():
    x = jnp.ones((2, 6, 3))
    y = constrain(x, "data", "cam")
    assert y is x


def test_make_mesh_2d_shape():
    mesh = make_mesh_2d(jax.devices(), cam=4)
    assert mesh.axis_names == ("data", "cam")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh_2d(jax.devices()[:6], cam=4)


def test_cam_mesh_eval_step_matches_single_device():
    """Inference on a (data=1, cam=2) serving mesh decodes the same boxes
    as the unsharded eval step (tools/test.py --cam-parallel layout)."""
    from graph_detr4d_tpu.parallel.step import build_eval_step

    cfg = tiny_test_config()
    model = GraphDETR4D(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    batch_np = synthetic_batch(cfg, batch_size=1, num_gt=4)
    dev_batch = {
        "images": jnp.asarray(batch_np["images"]),
        "lidar2img": jnp.asarray(batch_np["lidar2img"]),
    }

    det_ref = build_eval_step(model, cfg)(
        state.params, state.batch_stats, dev_batch
    )

    mesh = make_mesh_2d(jax.devices()[:2], cam=2)
    sharded = shard_batch(
        {k: np.asarray(v) for k, v in dev_batch.items()}, mesh
    )
    det_cam = build_eval_step(model, cfg, mesh)(
        state.params, state.batch_stats, sharded
    )

    np.testing.assert_array_equal(
        np.asarray(det_ref.valid), np.asarray(det_cam.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(det_ref.labels), np.asarray(det_cam.labels)
    )
    np.testing.assert_allclose(
        np.asarray(det_ref.bboxes),
        np.asarray(det_cam.bboxes),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(det_ref.scores),
        np.asarray(det_cam.scores),
        rtol=1e-4,
        atol=1e-5,
    )
