"""MemoryInitChip / MemoryFinalChip: offline memory-checking endpoints
(reference: crates/core/machine/src/memory/global.rs).

v1 scope: single-shard proofs — the endpoints balance the Memory multiset
locally (LookupScope::Local). The multi-shard septic-curve global digest
(reference GlobalChip) replaces the Local scope in a later milestone.

Soundness notes:
  * rows sorted by strictly increasing address (range-checked diff) so no
    address can be initialized or finalized twice;
  * init values byte-range-checked (they enter the multiset unchecked).
"""

from __future__ import annotations

import numpy as np

from ziren_tpu.executor.opcode import ByteOpcode as B
from ziren_tpu.stark.chip import Air
from ziren_tpu.stark.lookup import LookupKind
from .byte import count, count_u8_word, send_byte, send_u8_word
from .layout import Layout, pack_word, pad_to_pow2, word_decompose_np


def _layout(with_ts: bool) -> Layout:
    l = (
        Layout()
        .add("addr")
        .word("value")
        .word("addr_b")  # byte decomposition of addr (addr < 2^31, unique)
        .add("df", 4)  # one-hot: most significant byte where next > local
        .add("sel_lo").add("sel_hi")  # the compared byte pair
        .add("is_real")
        .add("has_next")  # is_real AND next row is real (lookup mults cannot
        # reference the next row, and the last row wraps around)
    )
    if with_ts:
        l.add("shard").add("clk")
    return l


def _fill_common(w, addrs, values, n):
    w.set("addr", addrs)
    w.set_word("value", values)
    ab = word_decompose_np(np.asarray(addrs, dtype=np.int64))
    w.set_word("addr_b", np.asarray(addrs, dtype=np.int64))
    df = np.zeros((n, 4), dtype=np.uint32)
    sel_lo = np.zeros(n, dtype=np.uint32)
    sel_hi = np.zeros(n, dtype=np.uint32)
    for r in range(n - 1):
        for k in (3, 2, 1, 0):
            if ab[r + 1, k] != ab[r, k]:
                assert ab[r + 1, k] > ab[r, k], "addresses not increasing"
                df[r, k] = 1
                sel_lo[r] = ab[r, k]
                sel_hi[r] = ab[r + 1, k]
                break
        else:
            raise AssertionError("duplicate address in memory endpoints")
    w.set("df", df)
    w.set("sel_lo", sel_lo)
    w.set("sel_hi", sel_hi)
    w.set("is_real", np.ones(n))
    has_next = np.ones(n, dtype=np.uint32)
    if n:
        has_next[n - 1] = 0
    w.set("has_next", has_next)


def _eval_ordering(b, L, N):
    """Strictly increasing addresses among real rows, compared
    lexicographically on the byte decomposition (exact: addr < 2^31, so the
    decomposition is unique — no mod-p aliasing)."""
    b.assert_bool(L["is_real"])
    b.assert_bool(L["has_next"])
    # once padding starts it never stops
    b.when_transition().assert_zero(N["is_real"] * (1 - L["is_real"]))
    # has_next == is_real * next.is_real (and 0 on the physically last row)
    b.when_transition().assert_eq(L["has_next"], L["is_real"] * N["is_real"])
    b.when_last_row().assert_zero(L["has_next"])
    ab = L.word("addr_b")
    b.when(L["is_real"]).assert_eq(L["addr"], pack_word(ab))
    send_byte(b, B.U8Range, ab[0], ab[1], 0, L["is_real"])
    send_byte(b, B.U8Range, ab[2], ab[3], 0, L["is_real"])
    send_byte(b, B.MSB, ab[3], 0, 0, L["is_real"])
    df = L["df"]
    acc = 0
    for k in range(4):
        b.assert_bool(df[k])
        acc = df[k] + acc
    b.assert_eq(acc, L["has_next"])  # strict: a differing byte must exist
    nb = N.word("addr_b")
    # bytes above the flagged byte are equal
    for k in range(4):
        for j in range(k + 1, 4):
            b.when_transition().assert_zero(df[k] * (nb[j] - ab[j]))
    # the flagged byte pair goes through an LTU lookup with result 1
    b.when_transition().assert_eq(
        L["sel_lo"], df[0] * ab[0] + df[1] * ab[1] + df[2] * ab[2] + df[3] * ab[3]
    )
    b.when_transition().assert_eq(
        L["sel_hi"], df[0] * nb[0] + df[1] * nb[1] + df[2] * nb[2] + df[3] * nb[3]
    )
    b.when_last_row().assert_zero(L["sel_lo"])
    b.when_last_row().assert_zero(L["sel_hi"])
    send_byte(b, B.LTU, L["sel_lo"], L["sel_hi"], 1, L["has_next"])


def _count_ordering(record, addrs, n):
    if n == 0:
        return
    ab = word_decompose_np(np.asarray(addrs, dtype=np.int64))
    count_u8_word(record, ab)
    count(record, B.MSB, ab[:, 3], 0)
    for r in range(n - 1):
        for k in (3, 2, 1, 0):
            if ab[r + 1, k] != ab[r, k]:
                count(record, B.LTU, ab[r : r + 1, k], ab[r + 1, k])
                break


class MemoryInitChip(Air):
    name = "MemoryInit"
    COLS = _layout(with_ts=False)
    width = COLS.width

    def included(self, record):
        return True

    def generate_dependencies(self, record, output):
        addrs = np.array([a for a, _ in record.mem_init], dtype=np.int64)
        vals = np.array([v for _, v in record.mem_init], dtype=np.int64)
        n = len(addrs)
        count_u8_word(record, word_decompose_np(vals))
        _count_ordering(record, addrs, n)

    def num_rows(self, record):
        return len(record.mem_init)

    def generate_trace(self, record, output):
        addrs = np.array([a for a, _ in record.mem_init], dtype=np.int64)
        vals = np.array([v for _, v in record.mem_init], dtype=np.int64)
        n = len(addrs)
        w = self.COLS.writer(n)
        _fill_common(w, addrs, vals, n)
        return pad_to_pow2(w.mat)

    def eval(self, b):
        L = self.COLS.view(b.main_local)
        N = self.COLS.view(b.main_next)
        _eval_ordering(b, L, N)
        send_u8_word(b, L.word("value"), L["is_real"])
        # overall init endpoint: a global *send* (cancels the first shard's
        # initial-tuple receive in the septic digest)
        b.send(
            LookupKind.Global,
            [0, 0, L["addr"]] + list(L.word("value"))
            + [L["is_real"], 0, int(LookupKind.Memory)],
            L["is_real"],
        )


class MemoryFinalChip(Air):
    name = "MemoryFinal"
    COLS = _layout(with_ts=True)
    width = COLS.width

    def generate_dependencies(self, record, output):
        addrs = np.array([a for a, _, _, _ in record.mem_final], dtype=np.int64)
        _count_ordering(record, addrs, len(addrs))

    def num_rows(self, record):
        return len(record.mem_final)

    def generate_trace(self, record, output):
        addrs = np.array([a for a, _, _, _ in record.mem_final], dtype=np.int64)
        shards = np.array([s for _, s, _, _ in record.mem_final], dtype=np.int64)
        clks = np.array([c for _, _, c, _ in record.mem_final], dtype=np.int64)
        vals = np.array([v for _, _, _, v in record.mem_final], dtype=np.int64)
        n = len(addrs)
        w = self.COLS.writer(n)
        _fill_common(w, addrs, vals, n)
        w.set("shard", shards)
        w.set("clk", clks)
        return pad_to_pow2(w.mat)

    def eval(self, b):
        L = self.COLS.view(b.main_local)
        N = self.COLS.view(b.main_next)
        _eval_ordering(b, L, N)
        # overall finalize endpoint: a global *receive*
        b.send(
            LookupKind.Global,
            [L["shard"], L["clk"], L["addr"]] + list(L.word("value"))
            + [0, L["is_real"], int(LookupKind.Memory)],
            L["is_real"],
        )
