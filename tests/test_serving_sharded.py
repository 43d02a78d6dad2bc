"""Multi-chip batch-parallel serving: the codec path under a data mesh.

The bitstream codec's device passes (forward transforms, channel-AR slice
stats) are pure jit functions of the batch — sharding the batch along a
``data`` mesh axis scales serving across chips with XLA inserting the
collectives (none needed here: images are independent).  This pins that a
batch sharded over all 8 virtual devices produces BIT-IDENTICAL streams
to the unsharded path, i.e. multi-chip serving changes throughput, not
the format.  (Reference has no multi-device serving at all; SURVEY §2.3.)
"""

import numpy as np
import pytest

import jax

from rgba_tpu.native import rans


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_codec_batch_sharded_bitstream_identical():
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.parallel.mesh import batch_sharding, make_mesh

    assert jax.device_count() >= 8, "conftest sets 8 virtual devices"
    mesh = make_mesh(8)

    key = jax.random.PRNGKey(0)
    model = MaskCodec()
    d = synthetic_rgba_batch(8, 64, 64, seed=11)
    alpha = d["alpha"]
    params = model.init({"params": key, "noise": key},
                        jnp.asarray(alpha[:1]), training=False)["params"]
    io = CodecIO(model, params, kind="mask")

    comps_plain = io.compress_batch(mask=alpha)
    sharded = jax.device_put(jnp.asarray(alpha), batch_sharding(mesh))
    assert len(sharded.sharding.device_set) == 8
    comps_shard = io.compress_batch(mask=sharded)

    for a, b in zip(comps_plain, comps_shard):
        assert a["shape"] == b["shape"]
        assert a["strings"][0] == b["strings"][0]
        assert a["strings"][1] == b["strings"][1]

    # decode of the sharded-encode streams reproduces the plain decode
    out_plain = io.decompress_batch(comps_plain)
    out_shard = io.decompress_batch(comps_shard)
    np.testing.assert_array_equal(out_plain, out_shard)


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_container_roundtrip_batch_sharded_identical():
    """FULL RGBAFileCodec encode_batch/decode_batch under the 8-device
    data mesh (VERDICT r3 item 7): encode takes batch-sharded device
    inputs, decode runs with batch-sharded CodecIOs (every host->device
    upload of both slice chains lands across the mesh via CodecIO._put),
    and both the container blobs and the decoded RGBA must be
    BIT-IDENTICAL to the single-device path — multi-chip serving changes
    throughput, not the format."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8, "conftest sets 8 virtual devices"
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))

    key = jax.random.PRNGKey(3)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d = synthetic_rgba_batch(8, 64, 64, seed=23)
    m0, x0 = d["alpha"][:1], d["masked_image"][:1]
    mask_params = mask_model.init({"params": key, "noise": key},
                                  jnp.asarray(m0),
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key},
                                jnp.asarray(x0), jnp.asarray(m0),
                                jnp.asarray(m0), mask_pyramid(jnp.asarray(m0)),
                                training=False)["params"]

    def build(sharding):
        return RGBAFileCodec(
            CodecIO(rgb_model, rgb_params, kind="rgb", sharding=sharding),
            CodecIO(mask_model, mask_params, kind="mask", sharding=sharding))

    plain = build(None)
    sharded = build(sh)

    blobs_plain = plain.encode_batch(d["image"], d["alpha"])
    rgba_plain = plain.decode_batch(blobs_plain)

    img_sh = jax.device_put(jnp.asarray(d["image"]), sh)
    alpha_sh = jax.device_put(jnp.asarray(d["alpha"]), sh)
    blobs_shard = sharded.encode_batch(img_sh, alpha_sh)
    assert blobs_shard == blobs_plain, "sharded encode changed the format"
    rgba_shard = sharded.decode_batch(blobs_shard)
    np.testing.assert_array_equal(np.asarray(rgba_shard),
                                  np.asarray(rgba_plain))


def test_packed_dse_shard_map_serving():
    """packed_dse under multi-chip batch sharding: GSPMD would have to
    insert cross-device collectives for the 4-image pack when the global
    batch is sharded thinner than 4 per chip.  The serving recipe is
    shard_map — inside it shapes are per-chip, so the %4 gate sees the
    LOCAL batch and packs (or falls back) chip-locally.  Pins that the
    shard_map forward equals the unsharded plain-DSE forward."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from rgba_tpu.core.precision import DEFAULT_POLICY, Policy
    from rgba_tpu.ops.enhance import DSE
    from rgba_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    plain = DSE(in_ch=3, policy=DEFAULT_POLICY)
    packed = DSE(in_ch=3, policy=Policy(packed_dse=True))
    key = jax.random.PRNGKey(7)
    # global batch 16 over 4 devices -> local batch 4: packs per chip
    x = jax.random.normal(key, (16, 64, 64, 3))
    params = plain.init(key, x)

    want = plain.apply(params, x)

    @jax.jit
    def fwd(p, xx):
        f = shard_map(lambda pp, xl: packed.apply(pp, xl),
                      mesh=mesh, in_specs=(P(), P("data")),
                      out_specs=P("data"))
        return f(p, xx)

    got = fwd(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # global batch 8 over 4 devices -> local batch 2: falls back to the
    # plain chain per chip, still correct
    x2 = jax.random.normal(jax.random.fold_in(key, 1), (8, 64, 64, 3))
    want2 = plain.apply(params, x2)
    got2 = fwd(params, x2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)
