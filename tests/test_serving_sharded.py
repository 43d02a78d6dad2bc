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
