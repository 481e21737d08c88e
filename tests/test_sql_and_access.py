"""SQL parser and access-plan unit tests (components #14/#15/#18 behaviors)."""

import numpy as np
import pytest

from pqvector_tpu.engine.access import (
    CandidateCursor,
    FileEntry,
    access_plan_for_rows,
    build_access_plans,
)
from pqvector_tpu.engine.expr import (
    BinaryExpr,
    Cast,
    Column,
    Literal,
    ScalarFunction,
    extract_array_distance,
    literal_to_f32_vector,
)
from pqvector_tpu.engine.sql import parse_sql
from pqvector_tpu.errors import PlanError


def test_parse_full_statement():
    stmt = parse_sql(
        "SELECT id, vec FROM t WHERE id >= 2 AND id < 10 "
        "ORDER BY array_distance(vec, [0.5, 1.5]) ASC LIMIT 7 OFFSET 3"
    )
    assert stmt.table == "t"
    assert len(stmt.projections) == 2
    assert stmt.limit == 7
    assert stmt.offset == 3
    assert len(stmt.order_by) == 1
    assert not stmt.order_by[0].descending
    match = extract_array_distance(stmt.order_by[0].expr)
    assert match is not None
    column, vec = match
    assert column == "vec"
    np.testing.assert_allclose(vec, [0.5, 1.5])


def test_parse_star_and_desc():
    stmt = parse_sql("SELECT * FROM data ORDER BY x DESC")
    assert stmt.projections[0].star
    assert stmt.order_by[0].descending
    assert stmt.limit is None


def test_parse_negative_and_scientific_numbers():
    stmt = parse_sql("SELECT a FROM t ORDER BY array_distance(a, [-1.5, 2e-3, .5]) LIMIT 1")
    _, vec = extract_array_distance(stmt.order_by[0].expr)
    np.testing.assert_allclose(vec, [-1.5, 0.002, 0.5])


def test_parse_errors():
    with pytest.raises(PlanError):
        parse_sql("SELECT FROM t")
    with pytest.raises(PlanError):
        parse_sql("SELECT a FROM t LIMIT")
    with pytest.raises(PlanError):
        parse_sql("SELECT a FROM t extra garbage ;")
    with pytest.raises(PlanError):
        parse_sql("SELECT a FROM t ORDER BY array_distance(a, [1.0, b]) LIMIT 1")


def test_extract_array_distance_strips_casts():
    inner = ScalarFunction(
        "array_distance",
        (Cast(Column("vec")), Cast(Literal([1.0, 2.0]))),
    )
    match = extract_array_distance(Cast(inner))
    assert match is not None
    assert match[0] == "vec"


def test_extract_array_distance_rejects_bad_shapes():
    assert extract_array_distance(Column("x")) is None
    assert (
        extract_array_distance(ScalarFunction("array_distance", (Column("a"),)))
        is None
    )
    # two columns, no literal
    assert (
        extract_array_distance(
            ScalarFunction("array_distance", (Column("a"), Column("b")))
        )
        is None
    )
    # literal that is not a float vector
    assert (
        extract_array_distance(
            ScalarFunction("array_distance", (Column("a"), Literal("hi")))
        )
        is None
    )


def test_literal_to_f32_vector():
    assert literal_to_f32_vector(Literal("x")) is None
    assert literal_to_f32_vector(Literal([])) is None
    vec = literal_to_f32_vector(Literal([1, 2.5]))
    assert vec.dtype == np.float32
    np.testing.assert_allclose(vec, [1.0, 2.5])


# ----------------------------------------------------------------------
# Access plans + cursor (access.rs semantics)
# ----------------------------------------------------------------------


def test_access_plan_maps_rows_to_groups():
    plan = access_plan_for_rows([10, 10, 10], np.array([0, 9, 10, 25, 25]))
    assert not plan.groups[0].skip
    np.testing.assert_array_equal(plan.groups[0].rows, [0, 9])
    np.testing.assert_array_equal(plan.groups[1].rows, [0])
    np.testing.assert_array_equal(plan.groups[2].rows, [5])  # deduped
    assert plan.selected_row_count() == 4


def test_access_plan_empty_rows_skips_everything():
    plan = access_plan_for_rows([5, 5], np.empty(0, dtype=np.int64))
    assert all(g.skip for g in plan.groups)


def test_build_access_plans_per_file():
    files = [
        FileEntry("a", [4], np.array([0, 1])),
        FileEntry("b", [4], np.array([2])),
    ]
    plans = build_access_plans(files, {"a": np.array([1])})
    np.testing.assert_array_equal(plans["a"].groups[0].rows, [1])
    assert plans["b"].groups[0].skip


def test_candidate_cursor_round_robin():
    cursor = CandidateCursor(3)
    cursor.add_candidates(0, np.array([10, 11, 12]))
    cursor.add_candidates(1, np.array([20]))
    cursor.add_candidates(2, np.array([30, 31]))
    batch = cursor.next_batch(4)
    # Fair round-robin across files (access.rs:214-242).
    assert batch == [(0, 10), (1, 20), (2, 30), (0, 11)]
    rest = cursor.next_batch(10)
    assert rest == [(2, 31), (0, 12)]
    assert cursor.next_batch(5) == []


def test_candidate_cursor_zero_batch():
    cursor = CandidateCursor(1)
    cursor.add_candidates(0, np.array([1]))
    assert cursor.next_batch(0) == []


def test_take_per_file_matches_next_batch_sets():
    """take_per_file must select the same candidate set per file as the
    tuple-at-a-time next_batch, for many shapes."""
    rng = np.random.default_rng(0)
    for n_files in (1, 2, 3, 5):
        for batch in (0, 1, 3, 7, 100):
            counts = rng.integers(0, 12, n_files)
            cands = [
                np.sort(rng.choice(1000, c, replace=False)) for c in counts
            ]
            a = CandidateCursor(n_files)
            b = CandidateCursor(n_files)
            for i, c in enumerate(cands):
                a.add_candidates(i, c)
                b.add_candidates(i, c)
            tuples = a.next_batch(batch)
            arrays = b.take_per_file(batch)
            ref: dict[int, list[int]] = {}
            for fi, row in tuples:
                ref.setdefault(fi, []).append(row)
            for i in range(n_files):
                np.testing.assert_array_equal(
                    arrays[i], np.asarray(ref.get(i, []), dtype=np.int64)
                )


def test_take_per_file_resumes_positions():
    cursor = CandidateCursor(2)
    cursor.add_candidates(0, np.array([1, 2, 3]))
    cursor.add_candidates(1, np.array([10]))
    first = cursor.take_per_file(2)
    np.testing.assert_array_equal(first[0], [1])
    np.testing.assert_array_equal(first[1], [10])
    second = cursor.take_per_file(10)
    np.testing.assert_array_equal(second[0], [2, 3])
    assert second[1].size == 0
