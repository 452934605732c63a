"""Measure the gradient pass with lane-friendly first/last layers.

The 3x50 BNN's row-major matmul operands pad pathologically: W1 (1,50)
and W4 (50,2) tile to 128 lanes (up to 70x physical inflation for the
head's gradients).  Mathematically the first layer is an outer product
(input dim 1) and the head is two matvecs, neither needing a padded
matmul.  This times fwd+bwd for: (a) the reference-shaped network, and
(b) the identical math with W1 stored (50,) and the head as two (50,)
vectors.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_CHAINS = 8192
STEPS = 200
BATCH = 20
N_DATA = 100


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def nll(out, yb):
    f_mean, f_log_var = out[:, 0:1], out[:, 1:2]
    f_var_inv = 1.0 / (jnp.exp(f_log_var) + 1e-16)
    mse = jnp.square(yb - f_mean)
    ll = jnp.sum(jnp.sum(-mse * 0.5 * f_var_inv - 0.5 * f_log_var, axis=1))
    return -ll / BATCH


def apply_ref(params, x):
    h = x
    for W, b in params[:-1]:
        h = jnp.tanh(h @ W + b)
    W, b = params[-1]
    return h @ W + b


def apply_dense(params, x):
    w1, b1, W2, b2, W3, b3, wm, wv, b4 = params
    h = jnp.tanh(x * w1[None, :] + b1)      # x is (B, 1): outer product
    h = jnp.tanh(h @ W2 + b2)
    h = jnp.tanh(h @ W3 + b3)
    f_mean = h @ wm + b4[0]
    f_log_var = h @ wv + b4[1]
    return jnp.stack([f_mean, f_log_var], axis=1)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, 1)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (BATCH, 1)), jnp.float32)

    def stack(shape):
        return jnp.asarray(
            rng.standard_normal((N_CHAINS,) + shape) * 0.1, jnp.bfloat16)

    ref_params = [
        (stack((1, 50)), stack((50,))),
        (stack((50, 50)), stack((50,))),
        (stack((50, 50)), stack((50,))),
        (stack((50, 2)), stack((2,))),
    ]
    dense_params = [
        stack((50,)), stack((50,)),
        stack((50, 50)), stack((50,)),
        stack((50, 50)), stack((50,)),
        stack((50,)), stack((50,)), stack((2,)),
    ]

    def make(apply_fn):
        def cost(params):
            out = apply_fn(params, x.astype(jnp.bfloat16)).astype(
                jnp.float32)
            return nll(out, y)

        @jax.jit
        def run(params):
            def body(carry, _):
                p = carry
                _, g = jax.vmap(jax.value_and_grad(cost))(p)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - jnp.bfloat16(1e-9) * b, p, g)
                return p, ()
            p, _ = jax.lax.scan(body, params, None, length=STEPS)
            return p
        return run

    # sanity: identical math
    p_ref1 = jax.tree_util.tree_map(lambda l: l[:1], ref_params)
    p_den1 = [
        p_ref1[0][0][0, 0], p_ref1[0][1][0],
        p_ref1[1][0][0], p_ref1[1][1][0],
        p_ref1[2][0][0], p_ref1[2][1][0],
        p_ref1[3][0][0][:, 0], p_ref1[3][0][0][:, 1], p_ref1[3][1][0],
    ]
    o1 = apply_ref(jax.tree_util.tree_map(lambda l: l[0], p_ref1),
                   x.astype(jnp.bfloat16))
    o2 = apply_dense(p_den1, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32),
        rtol=2e-2, atol=2e-2)
    print("math parity ok")

    print("%-28s %.3f ms/step" % (
        "grad ref shapes (bf16)", timeit(make(apply_ref), ref_params)))
    print("%-28s %.3f ms/step" % (
        "grad dense shapes (bf16)", timeit(make(apply_dense), dense_params)))


if __name__ == "__main__":
    main()
