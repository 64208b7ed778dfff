"""PackedTensors: round-trip + byte compatibility with tf.train.Example.

Role of reference packed_tensors_test.py (SURVEY.md §4); the TF cross-check
is NEW here — it pins the wire format to the reference's on-disk .tfci
framing (reference: tensorflow_compression/python/util/packed_tensors.py).
"""

import numpy as np
import pytest

from compression_tpu.util import PackedTensors


def test_roundtrip_mixed():
    p = PackedTensors()
    p.model = "bls2017-test"
    tensors = [
        b"\x00\x01\xffbitstream",
        np.array([768, 512], np.int32),
        np.array([1.5, -2.25], np.float32),
    ]
    p.pack(tensors)
    data = p.string

    q = PackedTensors(data)
    assert q.model == "bls2017-test"
    strings, ints, floats = q.unpack([object, np.int32, np.float32])
    assert strings[0] == tensors[0]
    np.testing.assert_array_equal(ints, tensors[1])
    np.testing.assert_array_equal(floats, tensors[2])


def test_repack_replaces_tensors():
    p = PackedTensors()
    p.model = "m"
    p.pack([np.arange(5)])
    p.pack([np.arange(2)])
    (vals,) = p.unpack([np.int64])
    np.testing.assert_array_equal(vals, [0, 1])
    assert p.model == "m"


def test_negative_ints():
    p = PackedTensors()
    p.pack([np.array([-1, -(2**40), 2**40], np.int64)])
    (vals,) = PackedTensors(p.string).unpack([np.int64])
    np.testing.assert_array_equal(vals, [-1, -(2**40), 2**40])


def test_tf_example_cross_compat():
    tf = pytest.importorskip("tensorflow")

    p = PackedTensors()
    p.model = "bmshj2018-hyperprior-mse-3"
    p.pack([b"stream-bytes", np.array([4, 9], np.int32)])
    data = p.string

    # TF must parse our bytes...
    ex = tf.train.Example.FromString(data)
    feats = ex.features.feature
    assert feats["MD"].bytes_list.value[0] == b"bmshj2018-hyperprior-mse-3"
    assert feats["0"].bytes_list.value[0] == b"stream-bytes"
    assert list(feats["1"].int64_list.value) == [4, 9]

    # ...and we must parse TF's bytes.
    ex2 = tf.train.Example()
    ex2.features.feature["MD"].bytes_list.value.append(b"model-x")
    ex2.features.feature["0"].bytes_list.value.append(b"abc")
    ex2.features.feature["1"].int64_list.value.extend([7, -3])
    ex2.features.feature["2"].float_list.value.extend([0.5])
    q = PackedTensors(ex2.SerializeToString())
    assert q.model == "model-x"
    s, i, f = q.unpack([object, np.int64, np.float32])
    assert s[0] == b"abc"
    np.testing.assert_array_equal(i, [7, -3])
    np.testing.assert_allclose(f, [0.5])
