"""Polynomial layer tests (parity targets: poly/multilin_test.go,
poly/eq_test.go, poly/lagrange_test.go)."""

import jax
import jax.numpy as jnp
import numpy as np

from gkr_mimc_tpu.fields import fr, scalar
from gkr_mimc_tpu.poly import lagrange, multilin
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows


def test_fold_exact_values():
    """poly/multilin_test.go:12-29: fold([0,1,2,3], r=5) == [10, 11]."""
    t = fr.from_ints_mont([0, 1, 2, 3])
    r = fr.from_int_mont(5)
    got = jax.jit(multilin.fold)(t, r)
    assert fr.to_ints(got) == [10, 11]


def test_fold_matches_scalar():
    vals = random_fr_array(16)
    r = random_fr_array(3)[2]
    got = jax.jit(multilin.fold)(fr.from_ints_mont(vals), fr.from_int_mont(r))
    mid = 8
    exp = [
        scalar.add(vals[i], scalar.mul(r, scalar.sub(vals[mid + i], vals[i])))
        for i in range(mid)
    ]
    assert fr.to_ints(got) == exp


def test_evaluate_matches_scalar():
    vals = random_fr_array(16)
    coords = random_fr_array(4)
    got = jax.jit(multilin.evaluate)(
        fr.from_ints_mont(vals), jnp.asarray(ints_to_rows(coords))
    )
    assert fr.to_int(got) == multilin.evaluate_scalar(vals, coords)


def test_eq_table_matches_scalar():
    for n in (1, 2, 4):
        q = random_fr_array(n)
        got = jax.jit(multilin.eq_table)(jnp.asarray(ints_to_rows(q)))
        assert fr.to_ints(got) == multilin.eq_table_scalar(q)


def test_eq_table_with_multiplier():
    q = random_fr_array(3)
    mult = 123456789
    got = jax.jit(multilin.eq_table)(
        jnp.asarray(ints_to_rows(q)), fr.from_int_mont(mult)
    )
    assert fr.to_ints(got) == multilin.eq_table_scalar(q, mult)


def test_eval_eq_vs_table_evaluate():
    """poly/eq_test.go pattern: EvalEq(q,h) == build-table-then-evaluate."""
    q = random_fr_array(4)
    h = random_fr_array(8)[4:]
    table = multilin.eq_table_scalar(q)
    via_table = multilin.evaluate_scalar(table, h)
    direct = multilin.eq_eval_scalar(q, h)
    assert via_table == direct
    # device direct
    got = jax.jit(multilin.eq_eval_device)(
        jnp.asarray(ints_to_rows(q)), jnp.asarray(ints_to_rows(h))
    )
    assert fr.to_int(got) == direct


def test_eq_prefix_chunked_equals_whole():
    """Chunk-local build (prefix-product seeding) == whole-table build —
    the sharded eq construction (poly/eq_test.go:28-58 pattern)."""
    n, k = 5, 2  # 4 chunks of 8
    q = random_fr_array(n)
    whole = multilin.eq_table_scalar(q)
    q_rows = jnp.asarray(ints_to_rows(q))

    def chunk(chunk_id):
        pref = multilin.eq_prefix(q_rows[:k], chunk_id)
        return multilin.eq_table(q_rows[k:], multiplier=pref)

    parts = [fr.to_ints(jax.jit(chunk)(jnp.uint32(c))) for c in range(1 << k)]
    flat = [v for part in parts for v in part]
    assert flat == whole


def test_lagrange_basis_property():
    """poly/lagrange_test.go:10-29: L_l(i) == delta(l, i)."""
    for size in (3, 9):
        lag = lagrange.lagrange_coefficients(size)
        for l in range(size):
            for i in range(size):
                v = lagrange.eval_univariate(list(lag[l]), i)
                assert v == (1 if i == l else 0)


def test_interpolate_on_range_roundtrip():
    vals = random_fr_array(9)
    coeffs = lagrange.interpolate_on_range(vals)
    for i in range(9):
        assert lagrange.eval_univariate(coeffs, i) == vals[i]
    # device version agrees
    got = jax.jit(lagrange.interpolate_on_range_device)(
        jnp.asarray(np.moveaxis(ints_to_rows(vals), -1, 0))
    )
    got_ints = fr.to_ints(got)
    assert got_ints == coeffs
