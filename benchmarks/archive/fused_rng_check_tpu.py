"""Hardware validation of the flash-SGHMC in-kernel noise stream.

Draws the exact noise the fused kernel injects (dual-output Box-Muller
over per-block-seeded TPU PRNG streams, ops/fused_step._normal_3d) into
an output buffer and checks moments, normality (KS vs N(0,1)), lane/row
structure, and cross-block correlation on the host.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysgmcmc_tpu.ops.fused_step import _normal_3d

N, C, R, S = 2048, 64, 72, 64


def main():
    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        out_ref[:] = _normal_3d((C, R, S))

    draws = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // C,),
            in_specs=[],
            out_specs=pl.BlockSpec((C, R, S), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, R, S), jnp.float32),
    )(jnp.asarray([12345], jnp.int32))
    x = np.asarray(draws).reshape(-1)
    n = x.size

    mean, std = x.mean(), x.std()
    skew = float(np.mean(((x - mean) / std) ** 3))
    kurt = float(np.mean(((x - mean) / std) ** 4) - 3)

    # KS vs standard normal
    from math import erf

    xs = np.sort(x[:: max(1, n // 2_000_000)])
    cdf = 0.5 * (1 + np.vectorize(erf)(xs / np.sqrt(2)))
    emp = np.arange(1, xs.size + 1) / xs.size
    ks = float(np.max(np.abs(cdf - emp)))

    # cross-block and cos/sin-half correlation
    b0 = np.asarray(draws[:C]).reshape(-1)
    b1 = np.asarray(draws[C:2 * C]).reshape(-1)
    block_corr = float(np.corrcoef(b0, b1)[0, 1])
    cos_half = np.asarray(draws[:, : R // 2, :]).reshape(-1)
    sin_half = np.asarray(draws[:, R // 2:, :]).reshape(-1)
    pair_corr = float(np.corrcoef(cos_half, sin_half)[0, 1])

    print("n=%d  mean=% .5f std=%.5f skew=% .4f ex.kurt=% .4f" % (
        n, mean, std, skew, kurt))
    print("KS=%.5f  cross-block corr=% .5f  cos/sin-pair corr=% .5f" % (
        ks, block_corr, pair_corr))


if __name__ == "__main__":
    main()
