"""The diet SoA's in-kernel f16 decode must be BIT-EXACT vs XLA's f16->f32
widening for every f16 bit pattern the pack side can produce (finite values
and inf; f16 NaN is unreachable — XLA's f32->f16 of a finite float rounds
or overflows to inf, never NaN). Exhaustive over all 65536 patterns."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from brush_tpu.ops.rasterize_pallas import _f16_to_f32


def test_f16_decode_exhaustive_bit_exact():
    u = jnp.arange(65536, dtype=jnp.int32).reshape(256, 256)
    got = np.asarray(jax.jit(_f16_to_f32)(u))
    exp = np.frombuffer(
        np.arange(65536, dtype=np.uint16).tobytes(), dtype=np.float16
    ).astype(np.float32).reshape(256, 256)
    nan = np.isnan(exp)
    # Non-NaN patterns (everything the pack side can emit): bit-exact.
    np.testing.assert_array_equal(got[~nan], exp[~nan])
    assert np.signbit(got[~nan]).tolist() == np.signbit(exp[~nan]).tolist()
    # NaN patterns are unreachable but must still decode to SOME NaN
    # (never a finite misread).
    assert np.isnan(got[nan]).all()
