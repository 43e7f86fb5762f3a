"""Parallel ahead-of-time compilation of the GKR walk's device programs.

The prover is a chain of per-round-size jitted programs (sumcheck/prover.py)
— ~2 gate classes x ~(bn - tail_bits) sizes plus eq/tail/package programs.
Dispatched lazily they compile one at a time, and on a remote-compile TPU
backend each costs ~10-30s: a cold bn=17 walk spends minutes in serial
compilation (the round-1 bench measured 225s warmup). XLA compiles are
embarrassingly parallel, so `warm(circuit, bn)` enumerates the exact
(program, shape) set the walk + verifier will use and AOT-compiles them in
a thread pool. Results land in JAX's persistent compilation cache, which
the subsequent real dispatches hit.

This is infrastructure the Go reference does not need (Go compiles once,
AOT); it is the TPU-native analog of nothing — pure XLA operational
plumbing.
"""

from __future__ import annotations

import concurrent.futures as _cf

import jax
import jax.numpy as jnp

from ..fields import fr

U32 = jnp.uint32


def _sds(shape):
    return jax.ShapeDtypeStruct(shape, U32)


def _gate_param_sds(gate):
    return tuple(_sds(p.shape) for p in gate.params())


def _walk_classes(circuit, bn: int):
    """(gate, n_tables, J_qprimes, J_claims) classes the GKR walk visits."""
    classes = []
    seen = set()
    nlayers = len(circuit)
    for l in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(l):
            break
        gate = circuit[l].gate
        if l == nlayers - 1:
            j_q, j_c = 1, 0
        else:
            j_q = j_c = len(circuit[l].out)
        key = (gate, len(circuit[l].in_), j_q, j_c)
        if key not in seen:
            seen.add(key)
            classes.append(key)
    return classes


def enumerate_jobs(circuit, bn: int, include_verify: bool = True,
                   group: int = 0):
    """List of (label, thunk) where thunk AOT-lowers + compiles one program.
    group > 1 enumerates the grouped-prover shapes (a G axis on every
    table/artifact) instead of the single-instance ones."""
    from ..sumcheck import prover as sp
    from ..gkr import verifier as gv

    jobs = []
    seen_labels = set()
    gdims = (group,) if group > 1 else ()

    def lower(label, f, *args):
        if label in seen_labels:  # claim-classes share round/tail programs
            return
        seen_labels.add(label)
        jobs.append((label, lambda: f.lower(*args).compile()))

    def tbl(size):
        return _sds((fr.L,) + gdims + (size,))

    n = 1 << bn
    tb = sp._tail_bits()
    tail_rounds = min(bn, tb)
    head_rounds = max(bn - tb, 0)

    if sp._use_monolith():
        # one whole-layer program per (gate, claim-count) class — the
        # dispatch-count fix (sumcheck/prover.py _use_monolith)
        for gate, n_tab, j_q, j_c in _walk_classes(circuit, bn):
            p_sds = _gate_param_sds(gate)
            xs = tuple(tbl(n) for _ in range(n_tab))
            q_sds = _sds((j_q, bn) + gdims + (fr.L,))
            c_sds = _sds((fr.L, j_c) + gdims)
            gruen = (
                sp._pallas_gate_kind(gate, [None] * n_tab) == "cipher"
                and j_q == 1
                and bn > tb
                and sp._coeff_pe_enabled()
                and sp._gruen_enabled()
            )
            if gruen:
                lower(
                    f"gruen[{gate.name},J={j_q},{j_c}]",
                    sp._prove_gruen_jit, gate, p_sds, xs, q_sds, c_sds,
                )
            else:
                lower(
                    f"monolith[{gate.name},J={j_q},{j_c}]",
                    sp._prove_jit, gate, p_sds, xs, q_sds, c_sds,
                )
        if include_verify and not gdims:
            _enum_verify(circuit, bn, lower, _sds)
        return jobs

    for gate, n_tab, j_q, j_c in _walk_classes(circuit, bn):
        p_sds = _gate_param_sds(gate)
        n_evals = gate.degree + 2

        # combined eq table + combined claim
        lower(
            f"make_eq[J={j_q},{j_c}]",
            sp._make_eq_jit,
            _sds((j_q, bn) + gdims + (fr.L,)),
            _sds((fr.L, j_c) + gdims),
        )
        if j_c > 0:
            lower(
                f"combined_claim[J={j_c}]",
                sp._combined_claim_jit,
                _sds((fr.L, j_c) + gdims),
            )

        # unrolled head rounds (one program per size; the output layer's
        # first round is the claim-less flavor, everything else tracks the
        # running claim — sumcheck/prover.py claim trick; the coefficient
        # path ignores claims entirely)
        use_coeff = (
            sp._pallas_gate_kind(gate, [None] * n_tab) is not None
            and sp._coeff_pe_enabled()
        )
        size = n
        first = True
        while size > (1 << tb):
            has_claim = (not use_coeff) and ((j_c > 0) or not first)
            f = sp._round_jit(gate, has_claim, donate=not first)
            xs = tuple(tbl(size) for _ in range(n_tab))
            if has_claim:
                lower(
                    f"round[{gate.name},{size},c]", f, p_sds, tbl(size), xs,
                    _sds((fr.L,) + gdims),
                )
            else:
                lower(f"round[{gate.name},{size}]", f, p_sds, tbl(size), xs)
            size //= 2
            first = False

        # masked-scan tail
        if size > 1:
            tail = (
                sp._tail_jit_donate
                if (head_rounds > 0 and sp._can_donate())
                else sp._tail_jit_keep
            )
            # NB: _prove_rounds passes xs as a tuple — pytree type matters
            xs = tuple(tbl(size) for _ in range(n_tab))
            lower(f"tail[{gate.name},{size}]", tail, gate, p_sds, tbl(size), xs)

        # packaging
        head_c = tuple(_sds((fr.L, n_evals) + gdims) for _ in range(head_rounds))
        head_r = tuple(_sds((fr.L,) + gdims) for _ in range(head_rounds))
        t_c = _sds((tail_rounds, fr.L, n_evals) + gdims) if tail_rounds else None
        t_r = _sds((tail_rounds, fr.L) + gdims) if tail_rounds else None
        fc_sds = _sds((1 + n_tab,) + gdims + (fr.L,))
        lower(
            f"package[{gate.name}]",
            sp._package_jit,
            head_rounds,
            n_evals,
            head_c,
            head_r,
            t_c,
            t_r,
            fc_sds,
        )

    if include_verify and not gdims:
        _enum_verify(circuit, bn, lower, _sds)

    return jobs


def _enum_verify(circuit, bn: int, lower, sds):
    from ..gkr import verifier as gv

    n = 1 << bn
    lower("evaluate", gv._evaluate_jit, sds((fr.L, n)), sds((bn, fr.L)))
    # challenge batches, grouped by per-layer coeff shape as verify does
    shape_counts: dict = {}
    nlayers = len(circuit)
    for l in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(l):
            break
        n_evals = circuit[l].gate.degree + 2
        shape_counts[(bn, n_evals)] = shape_counts.get((bn, n_evals), 0) + 1
    for (rounds, n_evals), count in shape_counts.items():
        if rounds == 0:
            continue
        args = tuple(sds((rounds, n_evals, fr.L)) for _ in range(count))
        lower(f"hash_chals[{count}x{n_evals}]", gv._hash_coeff_rows, *args)


def warm(circuit, bn: int, include_verify: bool = True, max_workers: int = 16,
         quiet: bool = True, group: int = 0):
    """AOT-compile all device programs for a bn-sized GKR walk in parallel.

    Returns (n_ok, failures) where failures is a list of (label, repr(err));
    warming is best-effort — a failed job only means that program compiles
    lazily at dispatch time instead.
    """
    jobs = enumerate_jobs(circuit, bn, include_verify, group=group)
    failures = []
    n_ok = 0
    with _cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = {ex.submit(thunk): label for label, thunk in jobs}
        for fut in _cf.as_completed(futs):
            label = futs[fut]
            try:
                fut.result()
                n_ok += 1
            except Exception as e:  # pragma: no cover - backend-dependent
                failures.append((label, repr(e)))
                if not quiet:
                    print(f"warm: {label} failed: {e!r}")
    return n_ok, failures
