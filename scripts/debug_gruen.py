"""Debug the Gruen kernel: compare Q_m = C(7,m) <S, u^(7-m) v^m> from the
kernel against a direct fr-ops computation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.poly import multilin


def get(x):
    return np.asarray(jax.device_get(x))


def rand_tab(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))


def main():
    bn = 10
    n = 1 << bn
    mid = n // 2
    x0, x1 = rand_tab((16, n), 2), rand_tab((16, n), 3)
    qprime = rand_tab((bn, 16), 11)
    ark = fr.from_int_mont(145646)

    s = multilin.eq_table(qprime[1:])  # (16, mid)

    # expected via fr ops
    u = fr.add(fr.add(x0[:, :mid], x1[:, :mid]), ark[:, None])
    st = fr.add(fr.add(x0[:, mid:], x1[:, mid:]), ark[:, None])
    v = fr.sub(st, u)
    import math

    qs = []
    up = [fr.one((mid,))]
    vp = [fr.one((mid,))]
    for _ in range(7):
        up.append(fr.mul(up[-1], u))
        vp.append(fr.mul(vp[-1], v))
    for m in range(8):
        raw = fr.mul(up[7 - m], vp[m])
        w = fr.reduce_sum(fr.mul(s, raw), 0)
        cm = fr.from_int_mont(math.comb(7, m))
        qs.append(fr.mul(w, cm))
    expected = jnp.stack(qs, axis=1)  # (16, 8)

    acc = K.cipher_gruen_acc(s, x0, x1, ark.reshape(16, 1), 1)
    got = K.finish_gruen_acc(acc)[..., 0]  # (16, 8)

    e = get(fr.canonicalize(expected))
    g = get(fr.canonicalize(got))
    for m in range(8):
        ok = (e[:, m] == g[:, m]).all()
        print(f"Q_{m}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            print("  exp", e[:4, m], "...")
            print("  got", g[:4, m], "...")


if __name__ == "__main__":
    main()


def check_round0():
    from gkr_mimc_tpu.sumcheck import prover as sp

    bn = 10
    n = 1 << bn
    x0, x1 = rand_tab((16, n), 2), rand_tab((16, n), 3)
    qprime = rand_tab((bn, 16), 11)
    ark = fr.from_int_mont(145646)
    s = multilin.eq_table(qprime[1:])

    acc = K.cipher_gruen_acc(s, x0, x1, ark.reshape(16, 1), 1)
    qc = K.finish_gruen_acc(acc)[..., 0]
    qk = qprime[0]
    ck = fr.one(())
    p_gruen = sp._gruen_combine(qc, qk, ck)

    from gkr_mimc_tpu.circuits.gates import CipherGate

    gate = CipherGate(145646)
    eq = multilin.eq_table(qprime)
    eqf, x0f, x1f = eq, x0, x1
    acc2 = K.cipher_coeff_acc(eqf, x0f, x1f, ark.reshape(16, 1), 1)
    p_direct = K.finish_coeff_acc(acc2, 8, 7)[..., 0]

    a = get(fr.canonicalize(p_gruen))
    b = get(fr.canonicalize(p_direct))
    for m in range(9):
        ok = (a[:, m] == b[:, m]).all()
        print(f"P_{m}: {'OK' if ok else 'MISMATCH'}")


check_round0()
