"""Weierstrass curve precompile chips (secp256k1 add / double), built on
the fixed-modulus byte-limb gadgets in field_gadget.py
(reference: crates/core/machine/src/syscall/precompiles/weierstrass/
weierstrass_add.rs / weierstrass_double.rs — same decomposition into
slope-numerator / slope / x3 / y3 field ops, re-derived for this engine).

Add (distinct affine points, one row per syscall):
    dx = x2 - x1          lin:  dx + x1 - x2 = b*m
    dy = y2 - y1          lin:  dy + y1 - y2 = b*m
    lam * dx = dy  mod m  mul
    lam2 = lam^2   mod m  mul
    x3: x3 + x1 + x2 - lam2 = b*m   (b in 0..2)
    xd = x1 - x3          lin:  xd + x3 - x1 = b*m
    t = lam * xd   mod m  mul
    y3: y3 + y1 - t = b*m
x1,y1 come from the p-write prev-value bytes, x2,y2 from the q-read values,
x3,y3 from the p-write values (byte limbs from the memory-access words);
x3 and y3 are range-checked < m against the constant modulus.

Double: lam = (3 x^2 + a) / (2 y), same tail. The p point is read unsafely
and overwritten in place (write at clk, no extra cycle — reference
create_ec_double_event), so the only memory accesses are the 16 writes.
"""

from __future__ import annotations

import numpy as np

from ziren_tpu.executor.opcode import ByteOpcode as B
from ziren_tpu.executor.opcode import SyscallCode
from ziren_tpu.stark.chip import Air
from ziren_tpu.stark.lookup import LookupKind
from .byte import count, send_byte
from .field_gadget import ModLinGadget, ModMulGadget, limbs_of, pack_limbs
from .layout import Layout
from .memory_access import add_access_cols, eval_access, fill_access

P256K1 = (1 << 256) - (1 << 32) - 977
NL = 32


def _access_words_to_int(words8) -> int:
    return sum(int(w) << (32 * i) for i, w in enumerate(words8))


def _word_limbs(view, names) -> list:
    """Byte limbs of 8 access words (4 byte cols each), little-endian."""
    out = []
    for nm in names:
        out += list(view.word(nm))
    return out


def _fill_witness_vec(row, layout, name, value, record=None):
    limbs = limbs_of(value, NL)
    row[layout.slc(name)] = limbs
    if record is not None:
        for k in range(0, NL, 2):
            count(record, B.U8Range, np.array([limbs[k]]), limbs[k + 1])


def _eval_witness_vec(b_, L, name, is_real):
    v = L[name]
    for k in range(0, NL, 2):
        send_byte(b_, B.U8Range, v[k], v[k + 1], 0, is_real)
    return list(v)


def _fill_lt(row, layout, prefix, value, record=None):
    rl = limbs_of(value, NL)
    ml = limbs_of(P256K1, NL)
    df = np.zeros(NL, dtype=np.uint32)
    for k in range(NL - 1, -1, -1):
        if rl[k] != ml[k]:
            df[k] = 1
            row[layout.idx(f"{prefix}_sel")] = rl[k]
            if record is not None:
                count(record, B.LTU, np.array([rl[k]]), ml[k])
            break
    else:
        raise AssertionError("value == modulus")
    row[layout.slc(f"{prefix}_df")] = df


def _eval_lt(b_, L, prefix, r_limbs, is_real):
    """r < m (constant modulus), lexicographic MSB-first."""
    ml = limbs_of(P256K1, NL)
    df = L[f"{prefix}_df"]
    acc = 0
    for k in range(NL):
        b_.assert_bool(df[k])
        acc = df[k] + acc
    b_.assert_eq(acc, is_real)
    for k in range(NL):
        for j in range(k + 1, NL):
            b_.assert_zero(df[k] * (r_limbs[j] - ml[j]))
    # the selected byte is committed so the lookup message stays degree 1
    sel = L[f"{prefix}_sel"]
    b_.assert_eq(sel, sum(df[k] * r_limbs[k] for k in range(NL)))
    sel_m = sum(df[k] * ml[k] for k in range(NL))
    send_byte(b_, B.LTU, sel, sel_m, 1, is_real)


class _WeierstrassBase(Air):
    def _events(self, record):
        return record.precompile_events.get(int(self.SYSCALL), [])

    def included(self, record):
        return bool(self._events(record))

    def _deps_accesses(self, record, ev, accesses):
        shard = ev["shard"]
        for ts, acc in accesses:
            prev_clk, prev_shard = acc[2], acc[3]
            compare = 1 if prev_shard == shard else 0
            diff = (ts - prev_clk - 1) if compare else (shard - prev_shard - 1)
            count(record, B.U16Range, np.array([diff & 0xFFFF]), 0)
            count(record, B.U8Range, np.array([diff >> 16]), 0)

    @staticmethod
    def _fill_access(r, layout, prefix, acc, ts, shard_now, write):
        addr, prev_v, prev_clk, prev_shard = acc[0], acc[1], acc[2], acc[3]
        value = acc[4] if write else acc[1]
        compare = 1 if prev_shard == shard_now else 0
        diff = (ts - prev_clk - 1) if compare else (shard_now - prev_shard - 1)
        r[layout.idx(f"{prefix}_prev_shard")] = prev_shard
        r[layout.idx(f"{prefix}_prev_clk")] = prev_clk
        r[layout.idx(f"{prefix}_compare_clk")] = compare
        r[layout.idx(f"{prefix}_d16")] = diff & 0xFFFF
        r[layout.idx(f"{prefix}_d8")] = diff >> 16
        for j in range(4):
            r[layout.slc(f"{prefix}_value")][j] = (int(value) >> (8 * j)) & 0xFF
            if write:
                r[layout.slc(f"{prefix}_prev_value")][j] = (
                    int(prev_v) >> (8 * j)
                ) & 0xFF


def _add_layout():
    l = Layout().add("shard").add("clk").add("p_ptr").add("q_ptr").add("is_real")
    for i in range(16):
        add_access_cols(l, f"pw{i}", write=True)
    for i in range(16):
        add_access_cols(l, f"qr{i}", write=False)
    for nm in ("dx", "dy", "lam", "lam2", "xd", "t"):
        l.add(nm, NL)
    l.add("x3_df", NL).add("y3_df", NL).add("x3_sel").add("y3_sel")
    return l


class Secp256k1AddChip(_WeierstrassBase):
    name = "Secp256k1Add"
    SYSCALL = SyscallCode.SECP256K1_ADD
    COLS = _add_layout()
    G_DX = ModLinGadget(COLS, "gdx", P256K1, NL)
    G_DY = ModLinGadget(COLS, "gdy", P256K1, NL)
    G_LAM = ModMulGadget(COLS, "glam", P256K1, NL)
    G_LAM2 = ModMulGadget(COLS, "glam2", P256K1, NL)
    G_X3 = ModLinGadget(COLS, "gx3", P256K1, NL, max_borrow=2)
    G_XD = ModLinGadget(COLS, "gxd", P256K1, NL)
    G_T = ModMulGadget(COLS, "gt", P256K1, NL)
    G_Y3 = ModLinGadget(COLS, "gy3", P256K1, NL)
    width = COLS.width

    def generate_dependencies(self, record, output):
        for ev in self._events(record):
            clk = ev["clk"]
            self._deps_accesses(
                record, ev,
                [(clk, a) for a in ev["reads"]]
                + [(clk + 1, a) for a in ev["writes"]],
            )
            self._witness_counts(record, ev)

    def _witness_counts(self, record, ev):
        C = self.COLS
        row = np.zeros(C.width, dtype=np.uint32)  # scratch
        self._fill_math(row, ev, record)

    def _fill_math(self, row, ev, record=None):
        C = self.COLS
        m = P256K1
        x1 = _access_words_to_int([w[1] for w in ev["writes"][:8]])
        y1 = _access_words_to_int([w[1] for w in ev["writes"][8:]])
        x2 = _access_words_to_int([r[1] for r in ev["reads"][:8]])
        y2 = _access_words_to_int([r[1] for r in ev["reads"][8:]])
        x3 = _access_words_to_int([w[4] for w in ev["writes"][:8]])
        y3 = _access_words_to_int([w[4] for w in ev["writes"][8:]])
        dx, dy = (x2 - x1) % m, (y2 - y1) % m
        lam = (dy * pow(dx, m - 2, m)) % m
        lam2 = (lam * lam) % m
        xd = (x1 - x3) % m
        t = (lam * xd) % m
        for nm, v in (("dx", dx), ("dy", dy), ("lam", lam), ("lam2", lam2),
                      ("xd", xd), ("t", t)):
            _fill_witness_vec(row, C, nm, v, record)
        self.G_DX.fill(row, C, [(1, dx), (1, x1), (-1, x2)], record)
        self.G_DY.fill(row, C, [(1, dy), (1, y1), (-1, y2)], record)
        self.G_LAM.fill(row, C, lam, dx, dy, record)
        self.G_LAM2.fill(row, C, lam, lam, lam2, record)
        self.G_X3.fill(row, C, [(1, x3), (1, x1), (1, x2), (-1, lam2)], record)
        self.G_XD.fill(row, C, [(1, xd), (1, x3), (-1, x1)], record)
        self.G_T.fill(row, C, lam, xd, t, record)
        self.G_Y3.fill(row, C, [(1, y3), (1, y1), (-1, t)], record)
        _fill_lt(row, C, "x3", x3, record)
        _fill_lt(row, C, "y3", y3, record)
        return row

    def generate_trace(self, record, output):
        events = self._events(record)
        n = len(events)
        height = max(4, 1 << max(0, n - 1).bit_length())
        C = self.COLS
        mat = np.zeros((height, C.width), dtype=np.uint32)
        shard_now = record.public_values.shard
        for r_i, ev in enumerate(events):
            row = self._fill_math(mat[r_i], ev)
            row[C.idx("shard")] = ev["shard"]
            row[C.idx("clk")] = ev["clk"]
            row[C.idx("p_ptr")] = ev["p_ptr"]
            row[C.idx("q_ptr")] = ev["q_ptr"]
            row[C.idx("is_real")] = 1
            for i in range(16):
                self._fill_access(row, C, f"pw{i}", ev["writes"][i],
                                  ev["clk"] + 1, shard_now, True)
                self._fill_access(row, C, f"qr{i}", ev["reads"][i],
                                  ev["clk"], shard_now, False)
        for g in (self.G_LAM, self.G_LAM2, self.G_T):
            g.fill_padding(mat, C, n)
        for g in (self.G_DX, self.G_DY, self.G_X3, self.G_XD, self.G_Y3):
            g.fill_padding(mat, C, n)
        return mat

    def eval(self, b_):
        C = self.COLS
        L = C.view(b_.main_local)
        is_real = L["is_real"]
        b_.assert_bool(is_real)
        b_.receive(
            LookupKind.Syscall,
            [L["shard"], L["clk"], int(self.SYSCALL), L["p_ptr"], L["q_ptr"]],
            is_real,
        )
        for i in range(16):
            eval_access(b_, L, f"qr{i}", L["shard"], L["clk"],
                        L["q_ptr"] + 4 * i, is_real, write=False)
            eval_access(b_, L, f"pw{i}", L["shard"], L["clk"] + 1,
                        L["p_ptr"] + 4 * i, is_real, write=True)
        x1 = _word_limbs(L, [f"pw{i}_prev_value" for i in range(8)])
        y1 = _word_limbs(L, [f"pw{i}_prev_value" for i in range(8, 16)])
        x2 = _word_limbs(L, [f"qr{i}_value" for i in range(8)])
        y2 = _word_limbs(L, [f"qr{i}_value" for i in range(8, 16)])
        x3 = _word_limbs(L, [f"pw{i}_value" for i in range(8)])
        y3 = _word_limbs(L, [f"pw{i}_value" for i in range(8, 16)])
        dx = _eval_witness_vec(b_, L, "dx", is_real)
        dy = _eval_witness_vec(b_, L, "dy", is_real)
        lam = _eval_witness_vec(b_, L, "lam", is_real)
        lam2 = _eval_witness_vec(b_, L, "lam2", is_real)
        xd = _eval_witness_vec(b_, L, "xd", is_real)
        t = _eval_witness_vec(b_, L, "t", is_real)
        self.G_DX.eval(b_, L, [(1, dx), (1, x1), (-1, x2)], is_real)
        self.G_DY.eval(b_, L, [(1, dy), (1, y1), (-1, y2)], is_real)
        self.G_LAM.eval(b_, L, lam, dx, dy, is_real)
        self.G_LAM2.eval(b_, L, lam, lam, lam2, is_real)
        self.G_X3.eval(b_, L, [(1, x3), (1, x1), (1, x2), (-1, lam2)], is_real)
        self.G_XD.eval(b_, L, [(1, xd), (1, x3), (-1, x1)], is_real)
        self.G_T.eval(b_, L, lam, xd, t, is_real)
        self.G_Y3.eval(b_, L, [(1, y3), (1, y1), (-1, t)], is_real)
        _eval_lt(b_, L, "x3", x3, is_real)
        _eval_lt(b_, L, "y3", y3, is_real)


def _double_layout():
    l = Layout().add("shard").add("clk").add("p_ptr").add("is_real")
    for i in range(16):
        add_access_cols(l, f"pw{i}", write=True)
    for nm in ("ty", "x2c", "tx", "lam", "lam2", "xd", "t"):
        l.add(nm, NL)
    l.add("x3_df", NL).add("y3_df", NL).add("x3_sel").add("y3_sel")
    return l


class Secp256k1DoubleChip(_WeierstrassBase):
    name = "Secp256k1Double"
    SYSCALL = SyscallCode.SECP256K1_DOUBLE
    COLS = _double_layout()
    G_TY = ModLinGadget(COLS, "gty", P256K1, NL)
    G_X2C = ModMulGadget(COLS, "gx2c", P256K1, NL)
    G_TX = ModLinGadget(COLS, "gtx", P256K1, NL, max_borrow=2)
    G_LAM = ModMulGadget(COLS, "glam", P256K1, NL)
    G_LAM2 = ModMulGadget(COLS, "glam2", P256K1, NL)
    G_X3 = ModLinGadget(COLS, "gx3", P256K1, NL, max_borrow=2)
    G_XD = ModLinGadget(COLS, "gxd", P256K1, NL)
    G_T = ModMulGadget(COLS, "gt", P256K1, NL)
    G_Y3 = ModLinGadget(COLS, "gy3", P256K1, NL)
    width = COLS.width

    def generate_dependencies(self, record, output):
        for ev in self._events(record):
            clk = ev["clk"]
            self._deps_accesses(record, ev, [(clk, a) for a in ev["writes"]])
            row = np.zeros(self.COLS.width, dtype=np.uint32)
            self._fill_math(row, ev, record)

    def _fill_math(self, row, ev, record=None):
        C = self.COLS
        m = P256K1
        x1 = _access_words_to_int([w[1] for w in ev["writes"][:8]])
        y1 = _access_words_to_int([w[1] for w in ev["writes"][8:]])
        x3 = _access_words_to_int([w[4] for w in ev["writes"][:8]])
        y3 = _access_words_to_int([w[4] for w in ev["writes"][8:]])
        ty = (2 * y1) % m
        x2c = (x1 * x1) % m
        tx = (3 * x2c) % m
        lam = (tx * pow(ty, m - 2, m)) % m
        lam2 = (lam * lam) % m
        xd = (x1 - x3) % m
        t = (lam * xd) % m
        for nm, v in (("ty", ty), ("x2c", x2c), ("tx", tx), ("lam", lam),
                      ("lam2", lam2), ("xd", xd), ("t", t)):
            _fill_witness_vec(row, C, nm, v, record)
        self.G_TY.fill(row, C, [(2, y1), (-1, ty)], record)
        self.G_X2C.fill(row, C, x1, x1, x2c, record)
        self.G_TX.fill(row, C, [(3, x2c), (-1, tx)], record)
        self.G_LAM.fill(row, C, lam, ty, tx, record)
        self.G_LAM2.fill(row, C, lam, lam, lam2, record)
        self.G_X3.fill(row, C, [(1, x3), (2, x1), (-1, lam2)], record)
        self.G_XD.fill(row, C, [(1, xd), (1, x3), (-1, x1)], record)
        self.G_T.fill(row, C, lam, xd, t, record)
        self.G_Y3.fill(row, C, [(1, y3), (1, y1), (-1, t)], record)
        _fill_lt(row, C, "x3", x3, record)
        _fill_lt(row, C, "y3", y3, record)
        return row

    def generate_trace(self, record, output):
        events = self._events(record)
        n = len(events)
        height = max(4, 1 << max(0, n - 1).bit_length())
        C = self.COLS
        mat = np.zeros((height, C.width), dtype=np.uint32)
        shard_now = record.public_values.shard
        for r_i, ev in enumerate(events):
            row = self._fill_math(mat[r_i], ev)
            row[C.idx("shard")] = ev["shard"]
            row[C.idx("clk")] = ev["clk"]
            row[C.idx("p_ptr")] = ev["p_ptr"]
            row[C.idx("is_real")] = 1
            for i in range(16):
                self._fill_access(row, C, f"pw{i}", ev["writes"][i],
                                  ev["clk"], shard_now, True)
        for g in (self.G_X2C, self.G_LAM, self.G_LAM2, self.G_T):
            g.fill_padding(mat, C, n)
        for g in (self.G_TY, self.G_TX, self.G_X3, self.G_XD, self.G_Y3):
            g.fill_padding(mat, C, n)
        return mat

    def eval(self, b_):
        C = self.COLS
        L = C.view(b_.main_local)
        is_real = L["is_real"]
        b_.assert_bool(is_real)
        b_.receive(
            LookupKind.Syscall,
            [L["shard"], L["clk"], int(self.SYSCALL), L["p_ptr"]],
            is_real,
        )
        for i in range(16):
            eval_access(b_, L, f"pw{i}", L["shard"], L["clk"],
                        L["p_ptr"] + 4 * i, is_real, write=True)
        x1 = _word_limbs(L, [f"pw{i}_prev_value" for i in range(8)])
        y1 = _word_limbs(L, [f"pw{i}_prev_value" for i in range(8, 16)])
        x3 = _word_limbs(L, [f"pw{i}_value" for i in range(8)])
        y3 = _word_limbs(L, [f"pw{i}_value" for i in range(8, 16)])
        ty = _eval_witness_vec(b_, L, "ty", is_real)
        x2c = _eval_witness_vec(b_, L, "x2c", is_real)
        tx = _eval_witness_vec(b_, L, "tx", is_real)
        lam = _eval_witness_vec(b_, L, "lam", is_real)
        lam2 = _eval_witness_vec(b_, L, "lam2", is_real)
        xd = _eval_witness_vec(b_, L, "xd", is_real)
        t = _eval_witness_vec(b_, L, "t", is_real)
        self.G_TY.eval(b_, L, [(2, y1), (-1, ty)], is_real)
        self.G_X2C.eval(b_, L, x1, x1, x2c, is_real)
        self.G_TX.eval(b_, L, [(3, x2c), (-1, tx)], is_real)
        self.G_LAM.eval(b_, L, lam, ty, tx, is_real)
        self.G_LAM2.eval(b_, L, lam, lam, lam2, is_real)
        self.G_X3.eval(b_, L, [(1, x3), (2, x1), (-1, lam2)], is_real)
        self.G_XD.eval(b_, L, [(1, xd), (1, x3), (-1, x1)], is_real)
        self.G_T.eval(b_, L, lam, xd, t, is_real)
        self.G_Y3.eval(b_, L, [(1, y3), (1, y1), (-1, t)], is_real)
        _eval_lt(b_, L, "x3", x3, is_real)
        _eval_lt(b_, L, "y3", y3, is_real)