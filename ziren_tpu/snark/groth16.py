"""Groth16 over BN254: setup + prove over a sparse R1CS, gnark-compatible
byte outputs (reference: crates/recursion/gnark-ffi/src/groth16_bn254.rs —
the Go gnark prover replaced by an in-house implementation over
ziren_tpu/verifier/bn254_pairing.py's curve arithmetic).

R1CS: constraints (A_k · w) * (B_k · w) = (C_k · w) over the BN254 scalar
field, wire 0 fixed to 1, wires 1..n_pub public. The QAP uses a power-of-two
evaluation domain in Fr (2-adicity 28); h(X) is computed on a coset.

Proof output is gnark's WriteTo layout (ar || bs || krs uncompressed,
nbCommitments=0 + zero PoK), verifying keys gnark's MarshalTo layout —
both round-trip through ziren_tpu.verifier.Groth16Verifier and byte-level
match what crates/verifier/src/groth16/converter.rs parses.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ziren_tpu.verifier import bn254_pairing as bp

R = bp.R
G1 = (1, 2)
G2 = (
    bp.FQ2((
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    )),
    bp.FQ2((
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    )),
)

# Fr two-adic structure: r - 1 = 2^28 * odd, multiplicative generator 5
TWO_ADICITY = 28
_ODD = (R - 1) >> TWO_ADICITY


def _root_of_unity(log_n: int) -> int:
    assert log_n <= TWO_ADICITY
    return pow(pow(5, _ODD, R), 1 << (TWO_ADICITY - log_n), R)


@dataclass
class R1CS:
    """Sparse constraints: each of a/b/c is a list (per constraint) of
    {wire_index: coeff} dicts. num_wires includes wire 0 (constant one)."""

    num_wires: int
    num_public: int  # wires 1..num_public are public inputs
    a: list
    b: list
    c: list

    def eval_row(self, row: dict, w: list) -> int:
        return sum(coeff * w[i] for i, coeff in row.items()) % R


@dataclass
class ProvingKey:
    vk_bytes: bytes
    # G1 / G2 elements of the CRS
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_tau: list  # [u_i(tau)]_1
    b_tau1: list  # [v_i(tau)]_1
    b_tau2: list  # [v_i(tau)]_2
    l_tau: list  # [(beta u_i + alpha v_i + w_i)/delta]_1 for private wires
    zt: list  # [tau^i t(tau)/delta]_1
    r1cs: R1CS


def _qap_polys(r1cs: R1CS):
    """Interpolate u_i, v_i, w_i over the 2^k domain (coefficient form)."""
    m = max(1, len(r1cs.a))
    log_n = max(1, (m - 1).bit_length())
    n = 1 << log_n
    w_root = _root_of_unity(log_n)
    # inverse NTT matrixless: values -> coeffs via INTT
    xs = [pow(w_root, i, R) for i in range(n)]

    def intt(vals):
        # naive O(n^2) — domains here are tiny (one row per constraint)
        n_inv = pow(n, R - 2, R)
        coeffs = []
        for j in range(n):
            acc = 0
            wj = pow(xs[j], R - 2, R) if xs[j] else 0
            for i in range(n):
                acc += vals[i] * pow(wj, i, R)
            coeffs.append(acc * n_inv % R)
        return coeffs

    polys = {"a": [], "b": [], "c": []}
    for name, rows in (("a", r1cs.a), ("b", r1cs.b), ("c", r1cs.c)):
        per_wire = [[0] * n for _ in range(r1cs.num_wires)]
        for k, row in enumerate(rows):
            for i, coeff in row.items():
                per_wire[i][k] = coeff % R
        polys[name] = [intt(v) for v in per_wire]
    return polys, n


def _poly_eval(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def setup(r1cs: R1CS, seed: bytes = b"ziren-groth16-dev") -> ProvingKey:
    """Deterministic (seed-derived) trusted setup — dev/test grade: the
    toxic waste is derivable from the seed, exactly like the reference's
    dev-mode artifacts built from dummy proofs (prover/src/build.rs)."""

    def felt(tag: bytes) -> int:
        return int.from_bytes(hashlib.sha256(seed + tag).digest(), "little") % R

    alpha, beta, gamma, delta, tau = (
        felt(b"alpha"), felt(b"beta"), felt(b"gamma"), felt(b"delta"),
        felt(b"tau"),
    )
    polys, n = _qap_polys(r1cs)
    t_tau = (pow(tau, n, R) - 1) % R
    gamma_inv = pow(gamma, R - 2, R)
    delta_inv = pow(delta, R - 2, R)

    u = [_poly_eval(p, tau) for p in polys["a"]]
    v = [_poly_eval(p, tau) for p in polys["b"]]
    w = [_poly_eval(p, tau) for p in polys["c"]]

    n_pub = r1cs.num_public
    k_pub = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * gamma_inv % R
        for i in range(n_pub + 1)
    ]
    l_priv = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * delta_inv % R
        for i in range(n_pub + 1, r1cs.num_wires)
    ]

    alpha1 = bp.g1_mul(G1, alpha)
    beta1 = bp.g1_mul(G1, beta)
    beta2 = bp.g2_mul(G2, beta)
    gamma2 = bp.g2_mul(G2, gamma)
    delta1 = bp.g1_mul(G1, delta)
    delta2 = bp.g2_mul(G2, delta)

    vk_bytes = _marshal_vk(
        alpha1, beta2, gamma2, delta2,
        [bp.g1_mul(G1, kv) for kv in k_pub],
    )
    return ProvingKey(
        vk_bytes=vk_bytes,
        alpha1=alpha1, beta1=beta1, beta2=beta2,
        delta1=delta1, delta2=delta2,
        a_tau=[bp.g1_mul(G1, x) for x in u],
        b_tau1=[bp.g1_mul(G1, x) for x in v],
        b_tau2=[bp.g2_mul(G2, x) for x in v],
        l_tau=[bp.g1_mul(G1, x) for x in l_priv],
        zt=[
            bp.g1_mul(G1, pow(tau, i, R) * t_tau % R * delta_inv % R)
            for i in range(n)
        ],
        r1cs=r1cs,
    )


def prove(pk: ProvingKey, witness: list, rand_seed: bytes = b"r") -> bytes:
    """witness: full wire assignment [1, publics..., privates...]. Returns
    gnark-layout proof bytes (ar || bs || krs || nbCommitments=0 || PoK=0)."""
    r1cs = pk.r1cs
    assert len(witness) == r1cs.num_wires
    witness = [x % R for x in witness]
    assert witness[0] == 1
    for ra, rb, rc in zip(r1cs.a, r1cs.b, r1cs.c):
        assert (
            r1cs.eval_row(ra, witness) * r1cs.eval_row(rb, witness) % R
            == r1cs.eval_row(rc, witness)
        ), "witness does not satisfy the R1CS"

    # h(X) = (A(X) B(X) - C(X)) / t(X), exact polynomial division
    polys, n = _qap_polys(r1cs)

    def combine(ps):
        out = [0] * n
        for wi, p in enumerate(ps):
            aw = witness[wi]
            if aw:
                for j in range(n):
                    out[j] = (out[j] + aw * p[j]) % R
        return out

    a_poly = combine(polys["a"])
    b_poly = combine(polys["b"])
    c_poly = combine(polys["c"])
    h_coeffs = _div_by_t(a_poly, b_poly, c_poly, n)

    def felt(tag: bytes) -> int:
        wb = b"".join(x.to_bytes(32, "little") for x in witness[:2])
        return int.from_bytes(
            hashlib.sha256(rand_seed + tag + wb).digest(), "little"
        ) % R

    r_rand, s_rand = felt(b"r"), felt(b"s")

    def msm(points, scalars):
        acc = None
        for p, s in zip(points, scalars):
            if s % R == 0 or p is None:
                continue
            acc = bp._add(acc, bp.g1_mul(p, s))
        return acc

    ar = bp._add(
        bp._add(pk.alpha1, msm(pk.a_tau, witness)),
        bp.g1_mul(pk.delta1, r_rand),
    )
    bs1 = bp._add(
        bp._add(pk.beta1, msm(pk.b_tau1, witness)),
        bp.g1_mul(pk.delta1, s_rand),
    )
    bs = bp._add(
        bp._add(pk.beta2, _msm2(pk.b_tau2, witness)),
        bp.g2_mul(pk.delta2, s_rand),
    )
    n_pub = r1cs.num_public
    krs = msm(pk.l_tau, witness[n_pub + 1 :])
    krs = bp._add(krs, msm(pk.zt, h_coeffs))
    krs = bp._add(krs, bp.g1_mul(ar, s_rand))
    krs = bp._add(krs, bp.g1_mul(bs1, r_rand))
    krs = bp._add(krs, bp.g1_neg(bp.g1_mul(pk.delta1, r_rand * s_rand % R)))

    return (
        _g1_bytes(ar) + _g2_bytes(bs) + _g1_bytes(krs)
        + (0).to_bytes(4, "big") + bytes(64)
    )


def _div_by_t(a_poly, b_poly, c_poly, n):
    """h = (A·B − C) / (X^n − 1): schoolbook product, exact long division."""
    q = [0] * (2 * n - 1)
    for i, ai in enumerate(a_poly):
        if ai:
            for j, bj in enumerate(b_poly):
                q[i + j] = (q[i + j] + ai * bj) % R
    for i, ci in enumerate(c_poly):
        q[i] = (q[i] - ci) % R
    # divide by X^n - 1: h[k] = q[k+n] + h[k+n] (h has degree <= n-2)
    h = [0] * n
    rem = list(q)
    for k in range(len(q) - 1, n - 1, -1):
        coef = rem[k]
        h[k - n] = coef
        rem[k] = 0
        rem[k - n] = (rem[k - n] + coef) % R
    assert all(v == 0 for v in rem), "t(X) does not divide A·B − C"
    return h


def _msm2(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        if s % R == 0 or p is None:
            continue
        acc = bp._add(acc, bp.g2_mul(p, s))
    return acc


# ---------------------------------------------------------------------------
# gnark byte layouts (crates/verifier/src/groth16/converter.rs)
# ---------------------------------------------------------------------------


def _g1_bytes(pt) -> bytes:
    return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def _g2_bytes(pt) -> bytes:
    x, y = pt
    return (
        x.c[1].to_bytes(32, "big") + x.c[0].to_bytes(32, "big")
        + y.c[1].to_bytes(32, "big") + y.c[0].to_bytes(32, "big")
    )


def _g1_compress(pt) -> bytes:
    if pt is None:  # infinity: flag 01, zero payload
        b = bytearray(32)
        b[0] = 0b01 << 6
        return bytes(b)
    x, y = pt
    ys = bp.g1_y_from_x(x)
    flag = 0b10 if y == ys[0] else 0b11
    b = bytearray(x.to_bytes(32, "big"))
    b[0] |= flag << 6
    return bytes(b)


def _g2_compress(pt) -> bytes:
    if pt is None:
        b = bytearray(64)
        b[0] = 0b01 << 6
        return bytes(b)
    x, y = pt
    ys = bp.g2_y_from_x(x)
    flag = 0b10 if y == ys[0] else 0b11
    b = bytearray(x.c[1].to_bytes(32, "big"))
    b[0] |= flag << 6
    return bytes(b) + x.c[0].to_bytes(32, "big")


def _marshal_vk(alpha1, beta2, gamma2, delta2, k_points) -> bytes:
    """gnark MarshalTo layout as parsed by the reference converter:
    alpha(32) || pad(32) || beta(64) || gamma(64) || pad(32) || delta(64)
    || num_k(4) || k[i](32 each)."""
    out = bytearray()
    out += _g1_compress(alpha1)
    out += bytes(32)  # [beta]_1 slot, unused by the verifier
    out += _g2_compress(beta2)
    out += _g2_compress(gamma2)
    out += bytes(32)  # [delta]_1 slot, unused by the verifier
    out += _g2_compress(delta2)
    out += len(k_points).to_bytes(4, "big")
    for kp in k_points:
        out += _g1_compress(kp)
    return bytes(out)
