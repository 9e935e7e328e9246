"""Golden conformance vectors.

Costs and gradients below are the published golden values from the reference
test suite (`/root/reference/pytorch_binding/warp_rnnt/test.py:34-336`), which
themselves originate from Awni Hannun's CPU ref_transduce.py.  They are test
DATA (hand-computed lattice values), shared by every implementation tier here.
"""

import numpy as np


def log_softmax(x, axis=-1):
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(axis=axis, keepdims=True))


# -- case: one frame, two labels (T=1, U=3, V=5) ---------------------------
ONE_TO_MANY = dict(
    xs=log_softmax(
        [[[[0.1, 0.6, 0.1, 0.1, 0.1],
           [0.1, 0.1, 0.6, 0.1, 0.1],
           [0.1, 0.1, 0.2, 0.8, 0.1]]]]
    ),
    ys=np.array([[1, 2]], dtype=np.int32),
    xn=np.array([1], dtype=np.int32),
    yn=np.array([2], dtype=np.int32),
    expected_costs=np.array([4.274244594423859]),
    expected_grads=np.array(
        [[[[0.0, -1.0, 0.0, 0.0, 0.0],
           [0.0, 0.0, -1.0, 0.0, 0.0],
           [-1.0, 0.0, 0.0, 0.0, 0.0]]]]
    ),
)

# -- case: one frame, empty target (T=1, U=1, V=5) --------------------------
ONE_TO_EMPTY = dict(
    xs=log_softmax([[[[0.1, 0.6, 0.1, 0.1, 0.1]]]]),
    ys=np.zeros((1, 0), dtype=np.int32),
    xn=np.array([1], dtype=np.int32),
    yn=np.array([0], dtype=np.int32),
    expected_costs=np.array([1.7314291957733714]),
    expected_grads=np.array([[[[-1.0, 0.0, 0.0, 0.0, 0.0]]]]),
)

# -- case: T=2, U=3, V=5 single sample ---------------------------------------
_FWD_SINGLE_XS = [
    [[[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.6, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.8, 0.1]],
     [[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.1, 0.1],
      [0.7, 0.1, 0.2, 0.1, 0.1]]]
]
FORWARD_SINGLE = dict(
    xs=log_softmax(_FWD_SINGLE_XS),
    ys=np.array([[1, 2]], dtype=np.int32),
    xn=np.array([2], dtype=np.int32),
    yn=np.array([2], dtype=np.int32),
    expected_costs=np.array([4.495666]),
    expected_grads=np.array(
        [[[[-0.308198071906, -0.6918019280939998, 0.0, 0.0, 0.0],
           [-0.308198071906, 0.0, -0.3836038561880001, 0.0, 0.0],
           [-0.3836038561880001, 0.0, 0.0, 0.0, 0.0]],
          [[0.0, -0.308198071906, 0.0, 0.0, 0.0],
           [0.0, 0.0, -0.6163961438119995, 0.0, 0.0],
           [-0.9999999999999991, 0.0, 0.0, 0.0, 0.0]]]]
    ),
)

# gathered (N, T, U, 2) layout of the same case: channel 0 = blank, 1 = label
FORWARD_SINGLE_GATHER_GRADS = np.array(
    [[[[-0.308198071906, -0.6918019280939998],
       [-0.308198071906, -0.3836038561880001],
       [-0.3836038561880001, 0.0]],
      [[0.0, -0.308198071906],
       [0.0, -0.6163961438119995],
       [-0.9999999999999991, 0.0]]]]
)

# -- case: ragged batch of two (xn = [2, 3]) --------------------------------
_FWD_BATCH_XS = [
    [[[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.6, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.8, 0.1]],
     [[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.1, 0.1],
      [0.7, 0.1, 0.2, 0.1, 0.1]],
     [[0.0, 0.0, 0.0, 0.0, 0.0],
      [0.0, 0.0, 0.0, 0.0, 0.0],
      [0.0, 0.0, 0.0, 0.0, 0.0]]],
    [[[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.6, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.8, 0.1]],
     [[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.1, 0.1],
      [0.7, 0.1, 0.2, 0.1, 0.1]],
     [[0.1, 0.6, 0.1, 0.1, 0.1],
      [0.1, 0.1, 0.6, 0.1, 0.1],
      [0.1, 0.1, 0.2, 0.8, 0.1]]],
]
FORWARD_BATCH = dict(
    xs=log_softmax(_FWD_BATCH_XS),
    ys=np.array([[1, 2], [1, 2]], dtype=np.int32),
    xn=np.array([2, 3], dtype=np.int32),
    yn=np.array([2, 2], dtype=np.int32),
    expected_costs=np.array([4.495666773770733, 5.7367250428101615]),
    expected_grads=np.array(
        [
            [[[-0.308198071906, -0.6918019280939998, 0.0, 0.0, 0.0],
              [-0.308198071906, 0.0, -0.3836038561880001, 0.0, 0.0],
              [-0.3836038561880001, 0.0, 0.0, 0.0, 0.0]],
             [[0.0, -0.308198071906, 0.0, 0.0, 0.0],
              [0.0, 0.0, -0.6163961438119995, 0.0, 0.0],
              [-0.9999999999999991, 0.0, 0.0, 0.0, 0.0]],
             [[0.0, 0.0, 0.0, 0.0, 0.0],
              [0.0, 0.0, 0.0, 0.0, 0.0],
              [0.0, 0.0, 0.0, 0.0, 0.0]]],
            [[[-0.45920877, -0.54079123, -0.0, -0.0, -0.0],
              [-0.32392462, -0.0, -0.21686661, -0.0, -0.0],
              [-0.21686661, -0.0, -0.0, -0.0, -0.0]],
             [[-0.13528414, -0.32392462, -0.0, -0.0, -0.0],
              [-0.29937584, -0.0, -0.3484734, -0.0, -0.0],
              [-0.56534001, -0.0, -0.0, -0.0, -0.0]],
             [[-0.0, -0.13528414, -0.0, -0.0, -0.0],
              [-0.0, -0.0, -0.43465999, -0.0, -0.0],
              [-1.0, -0.0, -0.0, -0.0, -0.0]]],
        ]
    ),
)

ALL_PADDED_CASES = {
    "one_to_many": ONE_TO_MANY,
    "one_to_empty": ONE_TO_EMPTY,
    "forward_single": FORWARD_SINGLE,
    "forward_batch": FORWARD_BATCH,
}
