"""Device-resident duplex-sponge Fiat-Shamir challenger.

Bit-exact mirror of core/challenger.py (DuplexChallenger<KoalaBear,
Poseidon2, 16, 8>), with the sponge state living on the accelerator in
Montgomery form. The BUFFER STRUCTURE (how many values are pending, when a
duplex fires) is host-side Python — it is fully determined by the proof
SHAPE, not by field values — so driving a prove through this challenger
issues only async device ops (one jitted permutation per duplex, one
while_loop for the proof-of-work grind) and never synchronizes the host on
a transcript value. That is what makes a zero-sync shard prove possible on
hardware where every host<->device round trip costs milliseconds+.

Values cross APIs in Montgomery form (matching the prover's resident data);
`sample_bits` decodes on device. Host-side canonical ints observed (e.g.
public values) are encoded host-side — no device op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F
from . import jfield as jf
from ziren_tpu.stark.aot import aot_jit
from . import jposeidon2 as jp2

WIDTH = 16
RATE = 8
NUM_BITS = 31

_P = np.uint64(F.P_INT)


def _mont_host(v) -> np.uint32:
    return np.uint32((np.uint64(int(v)) << np.uint64(32)) % _P)


@aot_jit(static_argnames=("k",))
def _duplex(state, inputs, k: int):
    """Overwrite state[:k] with inputs (k,) and permute. All mont."""
    if k:
        state = jnp.concatenate([inputs, state[k:]])
    return jp2.permute(state)


@aot_jit(static_argnames=("nb_bits", "n_in", "batch"))
def _grind(state, inputs, nb_bits: int, n_in: int, batch: int = 4096):
    """Smallest nonneg witness w such that duplexing [inputs, w] yields a
    sample with nb_bits low bits zero (mirrors DuplexChallenger.grind)."""
    mask = jnp.uint32((1 << nb_bits) - 1)
    base = state
    inp = jnp.broadcast_to(inputs, (batch, n_in)) if n_in else None
    tail = jnp.broadcast_to(base[n_in + 1 :], (batch, WIDTH - n_in - 1))

    def body(carry):
        start, found, w = carry
        cands = start + jax.lax.iota(jnp.uint32, batch)
        cm = jf.mont_encode(cands)[:, None]
        parts = ([inp] if n_in else []) + [cm, tail]
        st = jnp.concatenate(parts, axis=1)
        out = jp2.permute(st)
        samples = jf.mont_decode(out[:, RATE - 1])
        hits = (samples & mask) == 0
        idx = jnp.argmax(hits)
        any_hit = jnp.any(hits)
        w = jnp.where(any_hit & ~found, cands[idx], w)
        return (start + jnp.uint32(batch), found | any_hit, w)

    init = (jnp.uint32(0), jnp.bool_(False), jnp.uint32(0))
    _, _, w = jax.lax.while_loop(lambda c: ~c[1], body, init)
    return w


class JChallenger:
    """Device challenger. The input buffer holds SEGMENTS — 0-d mont
    scalars, 1-d mont vectors, or host numpy constants — concatenated only
    at duplex time, so observing a whole commitment costs ~2 device ops
    instead of 8+ (the eager glue was a measured chunk of per-shard
    latency on the tunneled accelerator). The output buffer is the
    post-permute state plus a host-side count — only COUNTS drive control
    flow, values never leave the device."""

    def __init__(self):
        self.state = jnp.zeros((WIDTH,), dtype=jnp.uint32)
        self.input_buffer: list = []  # segments; total length _buf_n
        self._buf_n = 0
        self._out_len = 0  # output buffer = state[:._out_len], popped at end

    @classmethod
    def from_host(cls, host_ch) -> "JChallenger":
        c = cls()
        st = (np.asarray(host_ch.state, np.uint64) << np.uint64(32)) % _P
        c.state = jnp.asarray(st.astype(np.uint32))
        if host_ch.input_buffer:
            seg = (
                (np.asarray(host_ch.input_buffer, np.uint64) << np.uint64(32))
                % _P
            ).astype(np.uint32)
            c.input_buffer = [seg]
            c._buf_n = seg.size
        # host output_buffer is always a prefix of state[:RATE]
        c._out_len = len(host_ch.output_buffer)
        if c._out_len:
            assert list(host_ch.output_buffer) == [
                int(v) for v in host_ch.state[: c._out_len]
            ]
        return c

    def _concat_buffer(self):
        if not self._buf_n:
            return jnp.zeros(0, jnp.uint32)
        parts = [jnp.atleast_1d(jnp.asarray(v)) for v in self.input_buffer]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def _duplexing(self) -> None:
        k = self._buf_n
        assert k <= RATE
        inputs = self._concat_buffer()
        self.input_buffer.clear()
        self._buf_n = 0
        self.state = _duplex(self.state, inputs, k=k)
        self._out_len = RATE

    def _push(self, seg, n: int) -> None:
        self._out_len = 0
        i = 0
        while i < n:
            take = min(RATE - self._buf_n, n - i)
            if i == 0 and take == n:
                self.input_buffer.append(seg)
            else:
                self.input_buffer.append(seg[i : i + take])
            self._buf_n += take
            i += take
            if self._buf_n == RATE:
                self._duplexing()

    # -- observe ------------------------------------------------------------
    def observe_mont(self, value) -> None:
        """value: 0-d mont device scalar (or mont uint32 constant)."""
        self._out_len = 0
        self.input_buffer.append(value)
        self._buf_n += 1
        if self._buf_n == RATE:
            self._duplexing()

    def observe_mont_vec(self, vec) -> None:
        """(k,) mont device vector — buffered as whole segments."""
        self._push(vec, int(vec.shape[0]))

    def observe_host_slice(self, values) -> None:
        """Canonical host ints/array — encoded host-side, no device op."""
        seg = (
            (np.asarray(values, np.uint32).reshape(-1).astype(np.uint64)
             << np.uint64(32)) % _P
        ).astype(np.uint32)
        self._push(seg, seg.size)

    # -- sample -------------------------------------------------------------
    def sample_mont(self):
        if self._buf_n or not self._out_len:
            self._duplexing()
        self._out_len -= 1
        return self.state[self._out_len]

    def sample_ext_mont(self):
        """(4,) mont device — directly usable by the prover kernels."""
        if not self._buf_n and self._out_len >= 4:
            s = self.state[self._out_len - 4 : self._out_len][::-1]
            self._out_len -= 4
            return s
        return jnp.stack([self.sample_mont() for _ in range(4)])

    def sample_bits(self, nb_bits: int):
        assert nb_bits <= NUM_BITS
        s = jf.mont_decode(self.sample_mont())
        return s & jnp.uint32((1 << nb_bits) - 1)

    def grind(self, nb_bits: int):
        """Device proof-of-work: returns the canonical witness (0-d device)
        and replays observe(witness) + sample_bits on the transcript."""
        n_in = self._buf_n
        assert n_in < RATE
        inputs = self._concat_buffer()
        w = _grind(self.state, inputs, nb_bits=nb_bits, n_in=n_in)
        self.observe_mont(jf.mont_encode(w))
        self.sample_bits(nb_bits)  # transcript replay of check_witness
        return w
