"""Bucket tables + conv-length arithmetic vs the reference's own code.

The reference functions are AST-extracted from /root/reference and executed
at test time (see reference_funcs.py) — an *independent* ground truth: a
bug shared between the repo implementation and the torch fixture can no
longer cancel out."""

import numpy as np
import pytest

from reference_funcs import (
    ref_conv_output_length,
    ref_image_bucket,
    ref_token_bucket_with_cls,
)

from one_peace_tpu.models.rel_pos import (
    make_image_bucket_position,
    make_token_bucket_position_with_cls,
)
from one_peace_tpu.models.adapters.audio import conv_output_length


@pytest.mark.parametrize("bucket_size", [8, 16, 64, 256])
def test_token_bucket_table_exact(bucket_size):
    ref = ref_token_bucket_with_cls(bucket_size, 1024)
    ours = make_token_bucket_position_with_cls(bucket_size, 1024)
    np.testing.assert_array_equal(ours, ref)


def test_audio_and_text_reference_buckets_agree():
    """audio.py vendors the same function; guard against divergence."""
    np.testing.assert_array_equal(
        ref_token_bucket_with_cls(128, 1024, source="text"),
        ref_token_bucket_with_cls(128, 1024, source="audio"))


@pytest.mark.parametrize("bucket_size", [2, 7, 16])
def test_image_bucket_table_exact(bucket_size):
    ref = ref_image_bucket(bucket_size)
    ours = make_image_bucket_position(bucket_size)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seconds", [1, 4, 10, 15])
def test_audio_conv_length_arithmetic(seconds):
    """Off-by-one here breaks every audio padding mask (SURVEY §7 hard
    part 6)."""
    spec = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2
    size = 16000 * seconds
    assert conv_output_length(size, spec) == ref_conv_output_length(size, spec)


def test_fixture_tables_are_reference_derived():
    """The torch fixture must source its tables from the reference code,
    not from the repo's implementation."""
    import torch_fixture as tf

    assert tf.make_token_bucket_position_with_cls is ref_token_bucket_with_cls \
        or tf.make_token_bucket_position_with_cls(8, 64).tolist() == \
        ref_token_bucket_with_cls(8, 64).tolist()
    import inspect

    src = inspect.getsource(tf)
    assert "one_peace_tpu.models.rel_pos" not in src
