"""StableHLO serving-artifact export (rgba_tpu/eval/export.py).

The deployment contract: export a jitted serving forward once, ship the
serialized bytes, and execute them in a fresh process without any model
code — outputs must match the live flax apply exactly (same platform,
same program)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgba_tpu.eval.export import (export_serving_forward, export_jitted,
                                  save_artifact, load_artifact)
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.pipeline import RGBAPipeline

KEY = jax.random.PRNGKey(7)


def _mask_batch(b=1, hw=64):
    rng = np.random.default_rng(0)
    return jnp.asarray((rng.random((b, hw, hw, 1)) > 0.5).astype(np.float32))


def _jit_apply(model, variables, *batch):
    # serving baseline is the JITTED forward — one compiled program, same
    # fusion decisions as the exported artifact (eager apply differs ~1e-9)
    return jax.jit(lambda v, *b: model.apply(v, *b, training=False))(
        variables, *batch)


def test_mask_codec_export_round_trip(tmp_path):
    mask = _mask_batch()
    model = MaskCodec()
    variables = model.init({"params": KEY, "noise": KEY}, mask,
                           training=False)
    want = _jit_apply(model, variables, mask)

    exp = export_serving_forward(model, variables, (mask,),
                                 platforms=("cpu",))
    path = str(tmp_path / "mask.shlo")
    nbytes = save_artifact(exp, path)
    assert nbytes > 0

    art = load_artifact(path)
    got = art.call(mask)
    # same program, same platform: exact agreement
    np.testing.assert_array_equal(np.asarray(got["x_hat"]),
                                  np.asarray(want["x_hat"]))
    np.testing.assert_array_equal(np.asarray(got["bpp"]),
                                  np.asarray(want["bpp"]))


def test_export_params_as_runtime_argument(tmp_path):
    mask = _mask_batch()
    model = MaskCodec()
    variables = model.init({"params": KEY, "noise": KEY}, mask,
                           training=False)
    exp = export_serving_forward(model, variables, (mask,),
                                 platforms=("cpu",), bundle_params=False)
    art = load_artifact(save_and_load_path(exp, tmp_path, "mask_p.shlo"))
    got = art.call(variables, mask)
    want = _jit_apply(model, variables, mask)
    np.testing.assert_array_equal(np.asarray(got["x_hat"]),
                                  np.asarray(want["x_hat"]))
    # unbundled artifact must be much smaller than the weights it omits
    param_bytes = sum(np.asarray(x).nbytes
                      for x in jax.tree_util.tree_leaves(variables))
    import os
    assert os.path.getsize(str(tmp_path / "mask_p.shlo")) < param_bytes


def save_and_load_path(exp, tmp_path, name):
    path = str(tmp_path / name)
    save_artifact(exp, path)
    return path


def test_export_rejects_wrong_shape(tmp_path):
    mask = _mask_batch()
    model = MaskCodec()
    variables = model.init({"params": KEY, "noise": KEY}, mask,
                           training=False)
    exp = export_serving_forward(model, variables, (mask,),
                                 platforms=("cpu",))
    art = load_artifact(save_and_load_path(exp, tmp_path, "m.shlo"))
    bad = jnp.zeros((1, 128, 128, 1), jnp.float32)   # exported at 64x64
    with pytest.raises(Exception):
        jax.block_until_ready(art.call(bad))


@pytest.mark.slow
def test_rgba_pipeline_export_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    mask = _mask_batch()
    model = RGBAPipeline()
    variables = model.init({"params": KEY, "noise": KEY}, x, mask,
                           training=False)
    want = _jit_apply(model, variables, x, mask)

    exp = export_serving_forward(model, variables, (x, mask),
                                 platforms=("cpu",))
    art = load_artifact(save_and_load_path(exp, tmp_path, "rgba.shlo"))
    got = art.call(x, mask)
    np.testing.assert_array_equal(np.asarray(got["x_hat"]),
                                  np.asarray(want["x_hat"]))
    np.testing.assert_array_equal(np.asarray(got["bpp"]),
                                  np.asarray(want["bpp"]))


def test_export_jitted_plain_function():
    f = lambda a, b: jnp.tanh(a) @ b
    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.ones((8, 4), jnp.float32)
    exp = export_jitted(f, (a, b), platforms=("cpu",))
    blob = exp.serialize()
    got = jax.export.deserialize(blob).call(a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(f(a, b)))
