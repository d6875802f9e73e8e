"""Tool-layer units: conv+BN folding equivalence, BEV PNG writer, storage
client path remapping."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), "..", relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fuse_conv_bn_preserves_outputs():
    """Folding frozen-BN stats into conv kernels leaves the backbone's
    function unchanged (tools/misc/fuse_conv_bn.py fuse_tree)."""
    from graph_detr4d_tpu.models.resnet import ResNet

    fuse = _load("tools/misc/fuse_conv_bn.py", "fuse_conv_bn")
    rng = np.random.RandomState(0)
    net = ResNet(depth=18, use_dcn=False)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    vs = net.init(jax.random.PRNGKey(0), x)
    # randomize the BN stats so folding is non-trivial
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape), jnp.float32
        ),
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    want = net.apply(vs, x)

    import copy

    params = copy.deepcopy(
        jax.tree.map(np.asarray, jax.device_get(vs["params"]))
    )
    bstats = copy.deepcopy(
        jax.tree.map(np.asarray, jax.device_get(vs["batch_stats"]))
    )
    n = fuse.fuse_tree(params, bstats)
    assert n > 10  # every conv+bn pair in r18
    got = net.apply({"params": params, "batch_stats": bstats}, x)
    for a, b in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )


def test_bev_png_writer(tmp_path):
    viz = _load("tools/misc/visualize_results.py", "visualize_results")
    boxes = np.asarray(
        [[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.5, 0.0, 0.0]], np.float32
    )
    img = viz.draw_bev(
        boxes, np.asarray([0]), np.asarray([0.9]),
        [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0], size=128,
    )
    assert img.shape == (128, 128, 3)
    assert img.max() > 0  # something was drawn
    out = os.path.join(tmp_path, "bev.png")
    viz.save_png(out, img)
    # PNG magic + parses back with PIL if available
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    try:
        from PIL import Image

        back = np.asarray(Image.open(out))
        np.testing.assert_array_equal(back, img)
    except ImportError:
        pass


def test_file_client_remap_and_read(tmp_path):
    from graph_detr4d_tpu.data.storage import FileClient

    p = os.path.join(tmp_path, "real", "file.bin")
    os.makedirs(os.path.dirname(p))
    with open(p, "wb") as f:
        f.write(b"hello")
    client = FileClient(
        path_mapping={"./data/nuscenes": os.path.join(tmp_path, "real")}
    )
    assert client.get("./data/nuscenes/file.bin") == b"hello"
    assert client.exists("./data/nuscenes/file.bin")
    assert not client.exists("./data/nuscenes/missing.bin")
