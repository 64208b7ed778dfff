import pytest

from compression_tpu.ops import same_padding_for_kernel


def test_odd_kernel_symmetric():
    assert same_padding_for_kernel((3,), True) == ((1, 1),)
    assert same_padding_for_kernel((5, 5), True) == ((2, 2), (2, 2))
    assert same_padding_for_kernel((3,), False) == ((1, 1),)


def test_even_kernel_asymmetric():
    # Correlation pads more on the right, convolution more on the left.
    assert same_padding_for_kernel((2,), True) == ((0, 1),)
    assert same_padding_for_kernel((2,), False) == ((1, 0),)
    assert same_padding_for_kernel((4, 2), True) == ((1, 2), (0, 1))
    assert same_padding_for_kernel((4, 2), False) == ((2, 1), (1, 0))


def test_kernel_one():
    assert same_padding_for_kernel((1, 1), True) == ((0, 0), (0, 0))


def test_invalid():
    with pytest.raises(ValueError):
        same_padding_for_kernel((0,), True)
