"""Integer-exact FIFO ≡ batch equivalence — the reference's own proof style
(models/rtstgcn/test_rtstgcn.py uses integer tensors so equality is exact,
not approximate)."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.ops.temporal import (
    causal_accumulate,
    causal_accumulate_step,
    init_accumulator_state,
)
from stgx.ops.graph_conv import partitioned_gcn


def test_integer_exact_accumulate():
    rng = np.random.default_rng(0)
    for gamma, stride in [(9, 1), (9, 2), (5, 1)]:
        x = jnp.asarray(
            rng.integers(-8, 8, size=(1, 50, 7, 4)).astype(np.float32)
        )
        y_batch = np.asarray(causal_accumulate(x, gamma, stride))
        state = init_accumulator_state(1, 7, 4, gamma, stride)
        outs = []
        for t in range(50):
            y_t, state = causal_accumulate_step(state, x[:, t], gamma, stride)
            outs.append(np.asarray(y_t))
        y_stream = np.stack(outs, axis=1)
        # integer arithmetic in fp32 is exact in this range → bitwise equal
        np.testing.assert_array_equal(y_stream, y_batch)


def test_integer_exact_gcn_matmul():
    # symmetric integer partitioned adjacency, like the reference's setup
    rng = np.random.default_rng(1)
    v, p, cin, cout = 7, 3, 4, 6
    a = rng.integers(0, 3, size=(p, v, v)).astype(np.float32)
    A = jnp.asarray(a + a.transpose(0, 2, 1))
    x = jnp.asarray(rng.integers(-4, 4, size=(1, 10, v, cin)).astype(np.float32))
    W = jnp.asarray(rng.integers(-2, 2, size=(p, cin, cout)).astype(np.float32))
    y = np.asarray(partitioned_gcn(x, A, W))
    # direct loop evaluation
    xn, An, Wn = np.asarray(x), np.asarray(A), np.asarray(W)
    expected = np.zeros((1, 10, v, cout), np.float32)
    for pi in range(p):
        for w in range(v):
            for vv in range(v):
                expected[0, :, w] += (
                    An[pi, vv, w] * xn[0, :, vv] @ Wn[pi]
                )
    np.testing.assert_array_equal(y, expected)
