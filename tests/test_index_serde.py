"""IVF index structure + binary serde tests.

Byte layout must be exactly the reference wire format
(/root/reference/src/ivf/index.rs:65-128) so files interoperate; the
round-trip test mirrors /root/reference/src/ivf/index.rs:495-511.
"""

import struct

import numpy as np
import pytest

from pqvector_tpu import FormatError, IvfIndex, ValidationError


def reference_fixture() -> IvfIndex:
    # Same fixture as the reference serde test (index.rs:497-502).
    return IvfIndex.from_lists(
        dim=3,
        centroids=np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32),
        inverted_lists=[np.array([0, 2, 4]), np.array([1, 3])],
    )


def test_round_trip():
    index = reference_fixture()
    restored = IvfIndex.from_bytes(index.to_bytes())
    assert restored.dim == index.dim
    assert restored.n_clusters == index.n_clusters
    np.testing.assert_array_equal(restored.centroids, index.centroids)
    np.testing.assert_array_equal(restored.list_offsets, index.list_offsets)
    np.testing.assert_array_equal(restored.row_ids, index.row_ids)


def test_exact_byte_layout():
    """Hand-assembled reference bytes decode; our encoder reproduces them."""
    expected = struct.pack("<II", 3, 2)
    expected += np.array([1, 2, 3, 4, 5, 6], "<f4").tobytes()
    expected += struct.pack("<I", 3) + np.array([0, 2, 4], "<u4").tobytes()
    expected += struct.pack("<I", 2) + np.array([1, 3], "<u4").tobytes()

    index = reference_fixture()
    assert index.to_bytes() == expected

    decoded = IvfIndex.from_bytes(expected)
    assert decoded.dim == 3
    assert decoded.n_clusters == 2
    np.testing.assert_array_equal(decoded.cluster_rows(0), [0, 2, 4])
    np.testing.assert_array_equal(decoded.cluster_rows(1), [1, 3])


def test_empty_cluster_serde():
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.zeros((3, 2), np.float32),
        inverted_lists=[np.array([7]), np.array([], np.uint32), np.array([1, 2])],
    )
    restored = IvfIndex.from_bytes(index.to_bytes())
    assert restored.cluster_rows(1).size == 0
    np.testing.assert_array_equal(restored.cluster_rows(2), [1, 2])


def test_truncated_buffer_rejected():
    with pytest.raises(FormatError):
        IvfIndex.from_bytes(b"\x01\x00\x00")
    index = reference_fixture()
    data = index.to_bytes()
    with pytest.raises(FormatError):
        IvfIndex.from_bytes(data[: len(data) - 3])


def test_zero_dim_or_clusters_rejected():
    with pytest.raises(FormatError):
        IvfIndex.from_bytes(struct.pack("<II", 0, 2))
    with pytest.raises(FormatError):
        IvfIndex.from_bytes(struct.pack("<II", 3, 0))


def test_from_assignments_groups_rows_ascending():
    centroids = np.zeros((3, 2), np.float32)
    assignments = np.array([2, 0, 2, 1, 0, 2])
    index = IvfIndex.from_assignments(centroids, assignments)
    np.testing.assert_array_equal(index.cluster_rows(0), [1, 4])
    np.testing.assert_array_equal(index.cluster_rows(1), [3])
    np.testing.assert_array_equal(index.cluster_rows(2), [0, 2, 5])


def test_find_closest_centroids_stable_order():
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.array([[0, 0], [1, 0], [1, 0], [3, 0]], np.float32),
        inverted_lists=[np.array([0]), np.array([1]), np.array([2]), np.array([3])],
    )
    # Ties between clusters 1 and 2 resolve to the lower index (stable sort,
    # index.rs:143).
    order = index.find_closest_centroids(np.array([1.0, 0.0]), 3)
    np.testing.assert_array_equal(order, [1, 2, 0])


def test_candidate_rows_probe_order():
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.array([[0, 0], [10, 0], [0, 10]], np.float32),
        inverted_lists=[np.array([5, 1]), np.array([2]), np.array([3, 4])],
    )
    rows = index.candidate_rows(np.array([0.0, 9.0]), 2)
    np.testing.assert_array_equal(rows, [3, 4, 5, 1])


def test_nprobe_clamped_to_cluster_count():
    index = reference_fixture()
    rows = index.candidate_rows(np.zeros(3), 99)
    assert rows.size == 5


def test_invalid_offsets_rejected():
    with pytest.raises(ValidationError):
        IvfIndex(
            dim=2,
            n_clusters=2,
            centroids=np.zeros((2, 2), np.float32),
            list_offsets=np.array([0, 3, 2]),
            row_ids=np.array([1, 2], np.uint32),
        )
