// MIPS32r2 executor hot loop (native path).
//
// Mirrors ziren_tpu/executor/executor.py (the semantic oracle) exactly:
// delay-slot pc model, clk += 5 per cycle, access positions Memory=0 C=1
// B=2 A=3 HI=4, unified register/memory address space, first-touch init
// tracking. Emits the same columnar event stream (SoA) consumed by chip
// trace generation. (reference: crates/core/executor/src/executor.rs —
// re-designed, not translated: columnar events, C ABI for ctypes.)
//
// Build: g++ -O2 -shared -fPIC -o libziren_executor.so executor.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <array>
#include <vector>
#include <string>
#include <map>

namespace {

constexpr uint32_t M32 = 0xFFFFFFFFu;
constexpr uint64_t KB_P = 2130706433ull;  // 2^31 - 2^24 + 1
#include "poseidon2_rc.inc"

inline uint64_t kb_sbox(uint64_t x) {
  x %= KB_P;
  uint64_t x2 = (x * x) % KB_P;
  return (x2 * x) % KB_P;
}

inline void kb_ext_layer(uint64_t s[16]) {
  uint64_t out[16];
  for (int j = 0; j < 16; j += 4) {
    uint64_t x0 = s[j], x1 = s[j+1], x2 = s[j+2], x3 = s[j+3];
    uint64_t t01 = x0 + x1, t23 = x2 + x3, t0123 = t01 + t23;
    uint64_t t01123 = t0123 + x1, t01233 = t0123 + x3;
    out[j+3] = t01233 + 2*x0;
    out[j+1] = t01123 + 2*x2;
    out[j]   = t01123 + t01;
    out[j+2] = t01233 + t23;
  }
  uint64_t sums[4];
  for (int k = 0; k < 4; k++)
    sums[k] = out[k] + out[k+4] + out[k+8] + out[k+12];
  for (int j = 0; j < 16; j++) s[j] = (out[j] + sums[j % 4]) % KB_P;
}

void kb_poseidon2(uint32_t state[16]) {
  static const uint64_t DIAG[16] = {
    KB_P - 2, 1, 2, (KB_P + 1) >> 1, 3, 4, (KB_P - 1) >> 1, KB_P - 3,
    KB_P - 4, KB_P - ((KB_P - 1) >> 8), KB_P - ((KB_P - 1) >> 3), KB_P - 127,
    (KB_P - 1) >> 8, (KB_P - 1) >> 3, (KB_P - 1) >> 4, 127,
  };
  uint64_t s[16];
  for (int i = 0; i < 16; i++) s[i] = state[i];
  kb_ext_layer(s);
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = kb_sbox(s[i] + P2_RC[r][i]);
    kb_ext_layer(s);
  }
  for (int r = 0; r < 13; r++) {
    s[0] = kb_sbox(s[0] + P2_RC[4 + r][0]);
    uint64_t total = 0;
    for (int i = 0; i < 16; i++) total += s[i];
    total %= KB_P;
    for (int i = 0; i < 16; i++) s[i] = (s[i] * DIAG[i] + total) % KB_P;
  }
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = kb_sbox(s[i] + P2_RC[17 + r][i]);
    kb_ext_layer(s);
  }
  for (int i = 0; i < 16; i++) state[i] = (uint32_t)s[i];
}

enum Opcode : uint32_t {
  ADD = 0, SUB = 1, MUL = 2, MULT = 3, MULTU = 4, DIV = 5, DIVU = 6,
  MOD = 7, MODU = 8, SLL = 9, SRL = 10, SRA = 11, ROR = 12, SLT = 13,
  SLTU = 14, AND_ = 15, OR_ = 16, XOR_ = 17, NOR_ = 18, CLZ = 19, CLO = 20,
  BEQ = 21, BGEZ = 22, BGTZ = 23, BLEZ = 24, BLTZ = 25, BNE = 26,
  Jump = 27, Jumpi = 28, JumpDirect = 29, SYSCALL = 30,
  LB = 31, LBU = 32, LH = 33, LHU = 34, LW = 35, LWL = 36, LWR = 37,
  LL = 38, SB = 39, SH = 40, SW = 41, SWL = 42, SWR = 43, SC = 44,
  INS = 45, MADDU = 46, MSUBU = 47, MADD = 48, MSUB = 49, MEQ = 50,
  MNE = 51, WSBH = 52, EXT = 53, TEQ = 54, SEXT = 55, UNIMPL = 0xFF,
};

struct Instr {
  uint32_t opcode, op_a, op_b, op_c;
  uint8_t imm_b, imm_c;
};

struct MemRec {
  uint32_t value;
  uint32_t clk;
  uint32_t shard;
};

struct Access {
  uint8_t act;
  uint32_t addr, prev_value, prev_clk, prev_shard, value;
  uint8_t is_write;
};

constexpr int POS_MEMORY = 0, POS_C = 1, POS_B = 2, POS_A = 3, POS_HI = 4;

struct CycleEvent {
  uint32_t clk, pc, next_pc, next_next_pc, instr_idx;
  uint32_t a, b, c, prev_a, exit_code, syscall_code;
  Access acc[5];  // mem, c, b, a, hi
};

struct PrecompileAccess {
  uint32_t addr, prev_value, prev_clk, prev_shard, value;
};

struct PrecompileEvent {
  uint32_t shard, clk, ptr;
  PrecompileAccess reads[16], writes[16];
};

struct ShaCompressEvent {
  uint32_t shard, clk, w_ptr, h_ptr;
  PrecompileAccess h_reads[8];
  PrecompileAccess w_reads[64];
  PrecompileAccess h_writes[8];
};

struct ShaExtendEvent {
  uint32_t shard, clk, ptr, i;
  PrecompileAccess reads[4];
  PrecompileAccess write;
};

struct Uint256Event {
  uint32_t shard, clk, x_ptr, y_ptr;
  PrecompileAccess reads[16];   // y words then modulus words
  PrecompileAccess writes[8];   // x words (prev = x, value = result)
};

struct KeccakEvent {
  uint32_t shard, clk, input_ptr, result_ptr, n_u32;
  PrecompileAccess len_read;
  std::vector<PrecompileAccess> reads;  // n_u32 input words
  PrecompileAccess writes[16];
};

static const uint64_t KECCAK_RC[24] = {
  0x0000000000000001ull, 0x0000000000008082ull, 0x800000000000808Aull,
  0x8000000080008000ull, 0x000000000000808Bull, 0x0000000080000001ull,
  0x8000000080008081ull, 0x8000000000008009ull, 0x000000000000008Aull,
  0x0000000000000088ull, 0x0000000080008009ull, 0x000000008000000Aull,
  0x000000008000808Bull, 0x800000000000008Bull, 0x8000000000008089ull,
  0x8000000000008003ull, 0x8000000000008002ull, 0x8000000000000080ull,
  0x000000000000800Aull, 0x800000008000000Aull, 0x8000000080008081ull,
  0x8000000000008080ull, 0x0000000080000001ull, 0x8000000080008008ull};

static const int KECCAK_ROT[5][5] = {
  {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
  {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14}};

static inline uint64_t rol64(uint64_t x, int r) {
  r %= 64;
  return r ? (x << r) | (x >> (64 - r)) : x;
}

static void keccakf(uint64_t a[25]) {
  for (int rnd = 0; rnd < 24; rnd++) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rol64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol64(a[x + 5 * y], KECCAK_ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    a[0] ^= KECCAK_RC[rnd];
  }
}

struct Executor {
  std::vector<Instr> instructions;
  std::vector<PrecompileEvent> p2_events;
  std::vector<ShaExtendEvent> sha_ext_events;
  std::vector<ShaCompressEvent> sha_cmp_events;
  std::vector<Uint256Event> u256_events;
  std::vector<KeccakEvent> keccak_events;
  uint32_t pc_start = 0, pc_base = 0;
  std::unordered_map<uint32_t, MemRec> memory;
  std::unordered_map<uint32_t, uint32_t> uninit;
  std::unordered_map<uint32_t, uint32_t> touched;  // addr -> init value
  std::vector<uint32_t> touch_order;
  std::vector<std::string> input_stream;
  size_t input_ptr = 0;
  std::vector<uint32_t> committed;
  std::vector<uint32_t> deferred;
  std::string stdout_buf;
  std::string public_values_stream;  // FD_PUBLIC_VALUES (fd 3) bytes
  std::unordered_map<std::string, uint64_t> tracker_open;
  std::map<std::string, uint64_t> cycle_tracker;
  std::map<uint32_t, uint64_t> op_counts, sys_counts;
  std::vector<CycleEvent> events;
  bool trace = true;
  uint32_t pc = 0, next_pc = 0, clk = 0, shard = 1;
  // continuation sharding (mirrors the python executor's run_sharded:
  // boundary at shard_cycles >= shard_size, branch+delay-slot kept
  // together, clk reset per shard)
  uint32_t shard_size_ = 0, shard_cycles = 0, shard_start_pc = 0;
  bool next_is_delayslot = false;
  std::unordered_map<uint32_t, std::array<uint32_t, 3>> sh_init;
  struct ShardMark { uint64_t end_cycle; uint32_t start_pc, next_pc; };
  std::vector<ShardMark> shard_marks;
  std::vector<std::vector<uint32_t>> shard_blobs;  // 7 u32 per addr
  uint64_t global_clk = 0, max_cycles = 0;
  bool exited = false;
  uint32_t exit_code = 0;
  std::string error;
  Access cur_acc[5];

  MemRec& lookup(uint32_t addr) {
    auto it = memory.find(addr);
    if (it == memory.end()) {
      uint32_t init = 0;
      auto u = uninit.find(addr);
      if (u != uninit.end()) init = u->second;
      it = memory.emplace(addr, MemRec{init, 0, 0}).first;
    }
    if (touched.find(addr) == touched.end()) {
      touched.emplace(addr, it->second.value);
      touch_order.push_back(addr);
    }
    if (shard_size_) {
      MemRec& r = it->second;
      if (sh_init.find(addr) == sh_init.end())
        sh_init.emplace(addr,
                        std::array<uint32_t, 3>{r.shard, r.clk, r.value});
    }
    return it->second;
  }

  void bump_shard() {
    std::vector<uint32_t> blob;
    blob.reserve(sh_init.size() * 7);
    for (auto& kv : sh_init) {
      const MemRec& r = memory.at(kv.first);
      blob.push_back(kv.first);
      blob.push_back(kv.second[0]);  // prev shard
      blob.push_back(kv.second[1]);  // prev clk
      blob.push_back(kv.second[2]);  // prev value
      blob.push_back(r.shard);
      blob.push_back(r.clk);
      blob.push_back(r.value);
    }
    shard_blobs.push_back(std::move(blob));
    shard_marks.push_back({events.size(), shard_start_pc, pc});
    sh_init.clear();
    shard++;
    clk = 0;
    shard_cycles = 0;
    shard_start_pc = pc;
  }

  uint32_t read(uint32_t addr, int pos) {
    MemRec& r = lookup(addr);
    uint32_t ts = clk + pos;
    if (trace)
      cur_acc[pos] = {1, addr, r.value, r.clk, r.shard, r.value, 0};
    uint32_t v = r.value;
    r.clk = ts;
    r.shard = shard;
    return v;
  }

  uint32_t write(uint32_t addr, uint32_t value, int pos) {
    if (addr == 0) value = 0;  // hard-wired $zero
    MemRec& r = lookup(addr);
    uint32_t ts = clk + pos;
    uint32_t prev = r.value;
    if (trace)
      cur_acc[pos] = {1, addr, prev, r.clk, r.shard, value, 1};
    r.value = value;
    r.clk = ts;
    r.shard = shard;
    return prev;
  }

  uint32_t peek(uint32_t addr) {
    auto it = memory.find(addr);
    return it == memory.end() ? 0u : it->second.value;
  }

  static int32_t s32(uint32_t x) { return (int32_t)x; }

  bool alu(uint32_t op, uint32_t b, uint32_t c, uint32_t& a, uint32_t& hi) {
    hi = 0;
    switch (op) {
      case ADD: a = b + c; break;
      case SUB: a = b - c; break;
      case SLL: a = b << (c & 31); break;
      case SRL: a = b >> (c & 31); break;
      case SRA: a = (uint32_t)(s32(b) >> (c & 31)); break;
      case ROR: { uint32_t sh = c & 31; a = sh ? ((b >> sh) | (b << (32 - sh))) : b; break; }
      case MUL: a = b * c; break;
      case SLT: a = s32(b) < s32(c); break;
      case SLTU: a = b < c; break;
      case MULT: { int64_t o = (int64_t)s32(b) * s32(c); a = (uint32_t)o; hi = (uint32_t)((uint64_t)o >> 32); break; }
      case MULTU: { uint64_t o = (uint64_t)b * c; a = (uint32_t)o; hi = (uint32_t)(o >> 32); break; }
      case DIV: {
        if (!c) return false;
        if (b == 0x80000000u && c == M32) { a = 0x80000000u; hi = 0; break; }
        a = (uint32_t)(s32(b) / s32(c)); hi = (uint32_t)(s32(b) % s32(c)); break;
      }
      case DIVU: { if (!c) return false; a = b / c; hi = b % c; break; }
      case MOD: {
        if (!c) return false;
        if (b == 0x80000000u && c == M32) { a = 0; break; }
        a = (uint32_t)(s32(b) % s32(c)); break;
      }
      case MODU: { if (!c) return false; a = b % c; break; }
      case AND_: a = b & c; break;
      case OR_: a = b | c; break;
      case XOR_: a = b ^ c; break;
      case NOR_: a = ~(b | c); break;
      case CLZ: a = b ? __builtin_clz(b) : 32; break;
      case CLO: a = (~b) ? __builtin_clz(~b) : 32; break;
      default: return false;
    }
    return true;
  }

  // returns true when done
  bool cycle() {
    uint32_t idx = (pc - pc_base) / 4;
    if (idx >= instructions.size()) { error = "pc out of range"; return true; }
    const Instr& in = instructions[idx];
    op_counts[in.opcode]++;
    uint32_t op = in.opcode;
    if (trace) memset(cur_acc, 0, sizeof(cur_acc));

    uint32_t ev_clk = clk, ev_pc = pc, ev_next_pc = next_pc;
    uint32_t next_next_pc = next_pc + 4;
    uint32_t a = 0, b = 0, c = 0, prev_a = 0, syscall_code = 0, ecode = 0;

    auto operands_bc = [&](uint32_t& bo, uint32_t& co) {
      co = in.imm_c ? in.op_c : read(in.op_c, POS_C);
      bo = in.imm_b ? in.op_b : read(in.op_b, POS_B);
    };

    if (op <= CLO) {  // ALU
      operands_bc(b, c);
      uint32_t hi;
      if (!alu(op, b, c, a, hi)) { error = "alu trap"; return true; }
      if (op == MULT || op == MULTU || op == DIV || op == DIVU) {
        write(33, hi, POS_HI);
        prev_a = hi;
      }
      write(in.op_a, a, POS_A);
    } else if (op >= BEQ && op <= BNE) {  // branch
      operands_bc(b, c);
      uint32_t src1 = read(in.op_a, POS_A);
      a = src1;
      bool taken = false;
      switch (op) {
        case BEQ: taken = src1 == b; break;
        case BNE: taken = src1 != b; break;
        case BGEZ: taken = s32(src1) >= 0; break;
        case BLEZ: taken = s32(src1) <= 0; break;
        case BGTZ: taken = s32(src1) > 0; break;
        case BLTZ: taken = s32(src1) < 0; break;
      }
      if (taken) next_next_pc = c + next_pc;
    } else if (op >= Jump && op <= JumpDirect) {
      uint32_t return_pc = next_pc + 4;
      if (op == Jump) { b = read(in.op_b, POS_B); next_next_pc = b; }
      else if (op == Jumpi) { b = in.op_b; next_next_pc = b; }
      else { b = in.op_b; next_next_pc = b + next_pc; }
      a = return_pc;
      write(in.op_a, return_pc, POS_A);
    } else if (op >= LB && op <= SC) {  // memory
      uint32_t rs = read(in.op_b, POS_B);
      uint32_t off = in.op_c;
      uint32_t addr = rs + off;
      uint32_t aligned = addr & ~3u;
      if (aligned < 0x1000) { error = "guest access below 0x1000"; return true; }
      if (aligned >= 0x7F000000u) { error = "guest access above MAX_MEMORY"; return true; }
      b = rs; c = off;
      uint32_t i = addr & 3;
      if (op <= LL) {  // loads
        uint32_t rt = peek(in.op_a);
        uint32_t mem = read(aligned, POS_MEMORY);
        switch (op) {
          case LW: case LL: a = mem; break;
          case LB: a = (uint32_t)(int32_t)(int8_t)(mem >> (i * 8)); break;
          case LBU: a = (mem >> (i * 8)) & 0xFF; break;
          case LH: a = (uint32_t)(int32_t)(int16_t)(mem >> ((addr & 2) * 8)); break;
          case LHU: a = (mem >> ((addr & 2) * 8)) & 0xFFFF; break;
          case LWL: { uint32_t v = mem << (24 - i * 8), m = 0xFFFFFFFFu << (24 - i * 8); a = (rt & ~m) | v; break; }
          case LWR: { uint32_t v = mem >> (i * 8), m = 0xFFFFFFFFu >> (i * 8); a = (rt & ~m) | v; break; }
        }
        prev_a = write(in.op_a, a, POS_A);
      } else {  // stores
        uint32_t rt = (op == SC) ? peek(in.op_a) : read(in.op_a, POS_A);
        uint32_t mem = peek(aligned);
        uint32_t val = rt;
        switch (op) {
          case SB: { uint32_t m = 0xFFu << (i * 8); val = (mem & ~m) | ((rt & 0xFF) << (i * 8)); break; }
          case SH: { uint32_t sh = (addr & 2) * 8, m = 0xFFFFu << sh; val = (mem & ~m) | ((rt & 0xFFFF) << sh); break; }
          case SWL: { uint32_t v = rt >> (24 - i * 8), m = 0xFFFFFFFFu >> (24 - i * 8); val = (mem & ~m) | v; break; }
          case SWR: { uint32_t v = rt << (i * 8), m = 0xFFFFFFFFu << (i * 8); val = (mem & ~m) | v; break; }
          default: break;  // SW, SC
        }
        write(aligned, val, POS_MEMORY);
        if (op == SC) { prev_a = write(in.op_a, 1, POS_A); a = 1; }
        else { a = rt; prev_a = rt; }
      }
    } else if (op == SYSCALL) {
      uint32_t id = peek(2);  // V0
      c = read(5, POS_C);     // A1
      b = read(4, POS_B);     // A0
      prev_a = id;
      syscall_code = id;
      uint32_t ret = id;
      bool halt = false;
      uint32_t extra_cycles = 0;
      sys_counts[id]++;
      switch (id) {
        case 0x00:  // HALT
          exited = true;
          exit_code = b;
          if (b != 0) { error = "halt with nonzero exit code"; return true; }
          halt = true;
          break;
        case 0x02: {  // WRITE
          uint32_t fd = b, buf = c, n = peek(6);
          std::string data;
          for (uint32_t k = 0; k < n; k++) {
            uint32_t w = peek((buf + k) & ~3u);
            data.push_back((char)((w >> (((buf + k) & 3) * 8)) & 0xFF));
          }
          if (fd == 3) {
            // FD_PUBLIC_VALUES: the public values stream (reference
            // write.rs:57)
            public_values_stream += data;
          } else if (fd >= 1 && fd <= 2) {
            // cycle-tracker markers are intercepted, not echoed
            std::string t = data;
            while (!t.empty() && (t.back() == '\n' || t.back() == ' '))
              t.pop_back();
            const std::string S = "cycle-tracker-start:";
            const std::string E = "cycle-tracker-end:";
            if (t.rfind(S, 0) == 0) {
              std::string name = t.substr(S.size());
              while (!name.empty() && name.front() == ' ') name.erase(0, 1);
              tracker_open[name] = global_clk;
            } else if (t.rfind(E, 0) == 0) {
              std::string name = t.substr(E.size());
              while (!name.empty() && name.front() == ' ') name.erase(0, 1);
              auto it = tracker_open.find(name);
              if (it != tracker_open.end()) {
                cycle_tracker[name] += global_clk - it->second;
                tracker_open.erase(it);
              }
            } else {
              stdout_buf += data;
            }
          } else if (fd == 4) {
            input_stream.push_back(data);
          }
          ret = n;
          break;
        }
        case 0x10:  // COMMIT
          if (committed.size() <= b) committed.resize(b + 1, 0);
          committed[b] = c;
          break;
        case 0x1A:  // COMMIT_DEFERRED_PROOFS
          if (deferred.size() <= b) deferred.resize(b + 1, 0);
          deferred[b] = c;
          break;
        case 0xF0:  // HINT_LEN
          if (input_ptr >= input_stream.size()) { error = "no more hints"; return true; }
          ret = (uint32_t)input_stream[input_ptr].size();
          break;
        case 0xF1: {  // HINT_READ
          if (input_ptr >= input_stream.size()) { error = "no more hints"; return true; }
          const std::string& buf = input_stream[input_ptr++];
          if ((uint32_t)buf.size() != c || (b % 4) != 0) { error = "bad hint read"; return true; }
          for (size_t k = 0; k < buf.size(); k += 4) {
            uint32_t word = 0;
            for (int j = 0; j < 4 && k + j < buf.size(); j++)
              word |= ((uint32_t)(uint8_t)buf[k + j]) << (8 * j);
            uint32_t addr = b + (uint32_t)k;
            if (uninit.count(addr) || memory.count(addr)) { error = "hint addr initialized"; return true; }
            uninit[addr] = word;
          }
          ret = c;
          break;
        }
        case 0x01010009: {  // KECCAK_SPONGE
          uint32_t input_ptr = b, result_ptr = c;
          KeccakEvent ev;
          ev.shard = shard; ev.clk = clk;
          ev.input_ptr = input_ptr; ev.result_ptr = result_ptr;
          {
            MemRec& r = lookup(result_ptr + 64);
            ev.len_read = {result_ptr + 64, r.value, r.clk, r.shard, r.value};
            ev.n_u32 = r.value;
            r.clk = clk; r.shard = shard;
          }
          if (ev.n_u32 % 36) { error = "keccak input length not a block multiple"; return true; }
          std::vector<uint32_t> words(ev.n_u32);
          ev.reads.resize(ev.n_u32);
          for (uint32_t i = 0; i < ev.n_u32; i++) {
            uint32_t addr = input_ptr + 4 * i;
            MemRec& r = lookup(addr);
            ev.reads[i] = {addr, r.value, r.clk, r.shard, r.value};
            words[i] = r.value;
            r.clk = clk; r.shard = shard;
          }
          uint64_t st[25] = {0};
          for (uint32_t blk = 0; blk < ev.n_u32 / 36; blk++) {
            for (int i = 0; i < 18; i++)
              st[i] ^= (uint64_t)words[36 * blk + 2 * i]
                     | ((uint64_t)words[36 * blk + 2 * i + 1] << 32);
            keccakf(st);
          }
          for (int i = 0; i < 16; i++) {
            uint32_t addr = result_ptr + 4 * i;
            uint32_t v = (i & 1) ? (uint32_t)(st[i / 2] >> 32) : (uint32_t)st[i / 2];
            MemRec& r = lookup(addr);
            ev.writes[i] = {addr, r.value, r.clk, r.shard, v};
            r.value = v; r.clk = clk + 1; r.shard = shard;
          }
          if (trace) keccak_events.push_back(ev);
          extra_cycles = 1;
          break;
        }
        case 0x0101001D: {  // UINT256_MUL
          uint32_t x_ptr = b, y_ptr = c;
          if (x_ptr % 4 || y_ptr % 4) { error = "uint256 unaligned"; return true; }
          Uint256Event ev;
          ev.shard = shard; ev.clk = clk; ev.x_ptr = x_ptr; ev.y_ptr = y_ptr;
          uint32_t xw[8], yw[8], mw[8];
          for (int i = 0; i < 8; i++) {  // x read unsafely (no records)
            uint32_t addr = x_ptr + 4 * i;
            auto it = memory.find(addr);
            xw[i] = it != memory.end() ? it->second.value
                    : (uninit.count(addr) ? uninit[addr] : 0);
          }
          for (int i = 0; i < 16; i++) {
            uint32_t addr = y_ptr + 4 * i;
            MemRec& r = lookup(addr);
            ev.reads[i] = {addr, r.value, r.clk, r.shard, r.value};
            (i < 8 ? yw[i] : mw[i - 8]) = r.value;
            r.clk = clk; r.shard = shard;
          }
          // prod = x * y (16 words)
          uint32_t prod[16] = {0};
          for (int i = 0; i < 8; i++) {
            uint64_t carry = 0;
            for (int j = 0; j < 8; j++) {
              uint64_t t = (uint64_t)xw[i] * yw[j] + prod[i + j] + carry;
              prod[i + j] = (uint32_t)t;
              carry = t >> 32;
            }
            prod[i + 8] = (uint32_t)carry;
          }
          uint32_t res[8];
          bool m_zero = true;
          for (int i = 0; i < 8; i++)
            if (mw[i]) m_zero = false;
          if (m_zero) {
            for (int i = 0; i < 8; i++) res[i] = prod[i];
          } else {
            // binary long division: r = prod mod m over 512 bits
            uint32_t rem[9] = {0};
            for (int bit = 511; bit >= 0; bit--) {
              uint32_t carry_in = (prod[bit / 32] >> (bit % 32)) & 1;
              for (int i = 0; i < 9; i++) {  // rem = (rem << 1) | bit
                uint32_t hi_bit = rem[i] >> 31;
                rem[i] = (rem[i] << 1) | carry_in;
                carry_in = hi_bit;
              }
              bool ge = rem[8] != 0;
              if (!ge) {
                for (int i = 7; i >= 0; i--) {
                  if (rem[i] != mw[i]) { ge = rem[i] > mw[i]; break; }
                  if (i == 0) ge = true;  // equal
                }
              }
              if (ge) {
                uint64_t borrow = 0;
                for (int i = 0; i < 8; i++) {
                  uint64_t t = (uint64_t)rem[i] - mw[i] - borrow;
                  rem[i] = (uint32_t)t;
                  borrow = (t >> 32) & 1;
                }
                rem[8] -= (uint32_t)borrow;
              }
            }
            for (int i = 0; i < 8; i++) res[i] = rem[i];
          }
          for (int i = 0; i < 8; i++) {
            uint32_t addr = x_ptr + 4 * i;
            MemRec& r = lookup(addr);
            ev.writes[i] = {addr, r.value, r.clk, r.shard, res[i]};
            r.value = res[i]; r.clk = clk + 1; r.shard = shard;
          }
          if (trace) u256_events.push_back(ev);
          extra_cycles = 1;
          break;
        }
        case 0x01010006: {  // SHA_COMPRESS
          uint32_t w_ptr = b, h_ptr = c;
          if (w_ptr % 4 || h_ptr % 4) { error = "sha_compress unaligned"; return true; }
          static const uint32_t K[64] = {
            0x428A2F98,0x71374491,0xB5C0FBCF,0xE9B5DBA5,0x3956C25B,0x59F111F1,
            0x923F82A4,0xAB1C5ED5,0xD807AA98,0x12835B01,0x243185BE,0x550C7DC3,
            0x72BE5D74,0x80DEB1FE,0x9BDC06A7,0xC19BF174,0xE49B69C1,0xEFBE4786,
            0x0FC19DC6,0x240CA1CC,0x2DE92C6F,0x4A7484AA,0x5CB0A9DC,0x76F988DA,
            0x983E5152,0xA831C66D,0xB00327C8,0xBF597FC7,0xC6E00BF3,0xD5A79147,
            0x06CA6351,0x14292967,0x27B70A85,0x2E1B2138,0x4D2C6DFC,0x53380D13,
            0x650A7354,0x766A0ABB,0x81C2C92E,0x92722C85,0xA2BFE8A1,0xA81A664B,
            0xC24B8B70,0xC76C51A3,0xD192E819,0xD6990624,0xF40E3585,0x106AA070,
            0x19A4C116,0x1E376C08,0x2748774C,0x34B0BCB5,0x391C0CB3,0x4ED8AA4A,
            0x5B9CCA4F,0x682E6FF3,0x748F82EE,0x78A5636F,0x84C87814,0x8CC70208,
            0x90BEFFFA,0xA4506CEB,0xBEF9A3F7,0xC67178F2};
          auto rotr = [](uint32_t x, int r) { return (x >> r) | (x << (32 - r)); };
          ShaCompressEvent ev;
          ev.shard = shard; ev.clk = clk; ev.w_ptr = w_ptr; ev.h_ptr = h_ptr;
          uint32_t hs[8], ws[64];
          for (int j = 0; j < 8; j++) {
            uint32_t addr = h_ptr + 4 * j;
            MemRec& r = lookup(addr);
            ev.h_reads[j] = {addr, r.value, r.clk, r.shard, r.value};
            hs[j] = r.value; r.clk = clk; r.shard = shard;
          }
          for (int i = 0; i < 64; i++) {
            uint32_t addr = w_ptr + 4 * i;
            MemRec& r = lookup(addr);
            ev.w_reads[i] = {addr, r.value, r.clk, r.shard, r.value};
            ws[i] = r.value; r.clk = clk; r.shard = shard;
          }
          uint32_t av=hs[0],bv=hs[1],cv=hs[2],dv=hs[3],e2=hs[4],fv=hs[5],gv=hs[6],hv=hs[7];
          for (int i = 0; i < 64; i++) {
            uint32_t S1 = rotr(e2,6)^rotr(e2,11)^rotr(e2,25);
            uint32_t chv = (e2 & fv) ^ ((~e2) & gv);
            uint32_t t1 = hv + S1 + chv + K[i] + ws[i];
            uint32_t S0 = rotr(av,2)^rotr(av,13)^rotr(av,22);
            uint32_t mj = (av & bv) ^ (av & cv) ^ (bv & cv);
            uint32_t t2 = S0 + mj;
            hv=gv; gv=fv; fv=e2; e2=dv+t1; dv=cv; cv=bv; bv=av; av=t1+t2;
          }
          uint32_t outs[8] = {hs[0]+av, hs[1]+bv, hs[2]+cv, hs[3]+dv,
                              hs[4]+e2, hs[5]+fv, hs[6]+gv, hs[7]+hv};
          for (int j = 0; j < 8; j++) {
            uint32_t addr = h_ptr + 4 * j;
            MemRec& r = lookup(addr);
            ev.h_writes[j] = {addr, r.value, r.clk, r.shard, outs[j]};
            r.value = outs[j]; r.clk = clk + 1; r.shard = shard;
          }
          if (trace) sha_cmp_events.push_back(ev);
          extra_cycles = 1;
          break;
        }
        case 0x30010005: {  // SHA_EXTEND
          uint32_t ptr = b;
          if (ptr % 4 != 0) { error = "sha_extend unaligned"; return true; }
          auto rotr = [](uint32_t x, int r) { return (x >> r) | (x << (32 - r)); };
          for (uint32_t i = 16; i < 64; i++) {
            uint32_t clk_i = clk + (i - 16);
            ShaExtendEvent ev;
            ev.shard = shard; ev.clk = clk_i; ev.ptr = ptr; ev.i = i;
            uint32_t vals[4];
            int offs[4] = {-16, -15, -7, -2};
            for (int k = 0; k < 4; k++) {
              uint32_t addr = ptr + 4 * (i + offs[k]);
              MemRec& r = lookup(addr);
              ev.reads[k] = {addr, r.value, r.clk, r.shard, r.value};
              vals[k] = r.value;
              r.clk = clk_i; r.shard = shard;
            }
            uint32_t s0 = rotr(vals[1], 7) ^ rotr(vals[1], 18) ^ (vals[1] >> 3);
            uint32_t s1 = rotr(vals[3], 17) ^ rotr(vals[3], 19) ^ (vals[3] >> 10);
            uint32_t out = vals[0] + s0 + vals[2] + s1;
            uint32_t waddr = ptr + 4 * i;
            MemRec& r = lookup(waddr);
            ev.write = {waddr, r.value, r.clk, r.shard, out};
            r.value = out; r.clk = clk_i; r.shard = shard;
            if (trace) sha_ext_events.push_back(ev);
          }
          extra_cycles = 48;
          break;
        }
        case 0x00010030: {  // POSEIDON2_PERMUTE
          uint32_t ptr = b;
          if (ptr % 4 != 0) { error = "poseidon2 unaligned"; return true; }
          PrecompileEvent ev;
          ev.shard = shard; ev.clk = clk; ev.ptr = ptr;
          uint32_t st[16];
          for (int k = 0; k < 16; k++) {
            uint32_t addr = ptr + 4 * k;
            MemRec& r = lookup(addr);
            ev.reads[k] = {addr, r.value, r.clk, r.shard, r.value};
            if (r.value >= (uint32_t)KB_P) { error = "poseidon2 input not canonical"; return true; }
            st[k] = r.value;
            r.clk = clk; r.shard = shard;
          }
          kb_poseidon2(st);
          for (int k = 0; k < 16; k++) {
            uint32_t addr = ptr + 4 * k;
            MemRec& r = lookup(addr);
            ev.writes[k] = {addr, r.value, r.clk, r.shard, st[k]};
            r.value = st[k]; r.clk = clk + 1; r.shard = shard;
          }
          if (trace) p2_events.push_back(ev);
          extra_cycles = 1;  // applied after the V0 write (reference order)
          break;
        }
        default:
          error = "unsupported syscall";
          return true;
      }
      a = ret;
      write(2, a, POS_A);
      clk += extra_cycles;
      if (halt) { ev_next_pc = 0; next_next_pc = 4; }
      else { ev_next_pc = next_pc; next_next_pc = next_pc + 4; }
    } else if (op == MEQ || op == MNE) {
      uint32_t a_old = peek(in.op_a);
      c = read(in.op_c, POS_C);
      b = read(in.op_b, POS_B);
      bool mov = (op == MEQ) ? (c == 0) : (c != 0);
      a = mov ? b : a_old;
      prev_a = write(in.op_a, a, POS_A);
    } else if (op == SEXT) {
      b = read(in.op_b, POS_B);
      c = in.op_c;
      a = c > 0 ? (uint32_t)(int32_t)(int16_t)(b & 0xFFFF)
                : (uint32_t)(int32_t)(int8_t)(b & 0xFF);
      write(in.op_a, a, POS_A);
    } else if (op == WSBH) {
      b = read(in.op_b, POS_B);
      a = (((b >> 16) & 0xFF) << 24) | (((b >> 24) & 0xFF) << 16) |
          ((b & 0xFF) << 8) | ((b >> 8) & 0xFF);
      write(in.op_a, a, POS_A);
    } else if (op == EXT) {
      b = read(in.op_b, POS_B);
      c = in.op_c;
      uint32_t msbd = c >> 5, lsb = c & 31;
      uint32_t mask = (msbd + lsb + 1 == 32) ? M32 : ((1u << (msbd + lsb + 1)) - 1);
      a = (b & mask) >> lsb;
      write(in.op_a, a, POS_A);
    } else if (op == INS) {
      b = read(in.op_b, POS_B);
      c = in.op_c;
      uint32_t a_old = peek(in.op_a);
      uint32_t msb = c >> 5, lsb = c & 31;
      uint32_t mask = (msb - lsb + 1 == 32) ? M32 : ((1u << (msb - lsb + 1)) - 1);
      uint32_t mf = mask << lsb;
      a = (a_old & ~mf) | ((b << lsb) & mf);
      prev_a = write(in.op_a, a, POS_A);
    } else if (op == TEQ) {
      b = read(in.op_b, POS_B);
      a = read(in.op_a, POS_A);
      if (a == b) { error = "TEQ trap"; return true; }
    } else if (op == MADDU || op == MSUBU || op == MADD || op == MSUB) {
      c = read(in.op_c, POS_C);
      b = read(in.op_b, POS_B);
      uint32_t lo = peek(32), hi = peek(33);
      uint64_t acc = ((uint64_t)hi << 32) | lo;
      uint64_t m = (op == MADDU || op == MSUBU)
                       ? (uint64_t)b * c
                       : (uint64_t)((int64_t)s32(b) * s32(c));
      uint64_t out = (op == MADDU || op == MADD) ? acc + m : acc - m;
      a = (uint32_t)out;
      write(in.op_a, a, POS_A);
      write(33, (uint32_t)(out >> 32), POS_HI);
      prev_a = lo;
    } else {
      error = "unimplemented instruction";
      return true;
    }

    if (next_next_pc == 0) { error = "null pointer reference"; return true; }

    if (trace) {
      CycleEvent ev;
      ev.clk = ev_clk; ev.pc = ev_pc; ev.next_pc = ev_next_pc;
      ev.next_next_pc = next_next_pc; ev.instr_idx = idx;
      ev.a = a; ev.b = b; ev.c = c; ev.prev_a = prev_a;
      ev.exit_code = ecode; ev.syscall_code = syscall_code;
      memcpy(ev.acc, cur_acc, sizeof(cur_acc));
      events.push_back(ev);
    }

    pc = (op == SYSCALL) ? ev_next_pc : next_pc;
    next_pc = next_next_pc;
    clk += 5;
    global_clk++;
    shard_cycles++;
    next_is_delayslot = (op >= BEQ && op <= JumpDirect);
    if (max_cycles && global_clk >= max_cycles) { error = "exceeded cycle limit"; return true; }
    bool done = pc == 0 || exited ||
                (uint64_t)(pc - pc_base) >= instructions.size() * 4;
    if (!done && shard_size_ && shard_cycles >= shard_size_ &&
        !next_is_delayslot)
      bump_shard();
    return done;
  }
};

}  // namespace

extern "C" {

void* ziren_exec_new(const uint32_t* instrs, uint32_t n_instrs,
                     uint32_t pc_start, uint32_t pc_base,
                     const uint32_t* image_addrs, const uint32_t* image_vals,
                     uint32_t n_image, int trace) {
  auto* ex = new Executor();
  ex->instructions.resize(n_instrs);
  for (uint32_t i = 0; i < n_instrs; i++) {
    const uint32_t* p = instrs + i * 6;
    ex->instructions[i] = {p[0], p[1], p[2], p[3], (uint8_t)p[4], (uint8_t)p[5]};
  }
  ex->pc_start = pc_start;
  ex->pc_base = pc_base;
  ex->pc = pc_start;
  ex->next_pc = pc_start + 4;
  for (uint32_t i = 0; i < n_image; i++)
    ex->memory.emplace(image_addrs[i], MemRec{image_vals[i], 0, 0});
  ex->trace = trace != 0;
  return ex;
}

void ziren_exec_add_hint(void* h, const uint8_t* data, uint32_t len) {
  auto* ex = (Executor*)h;
  ex->input_stream.emplace_back((const char*)data, len);
}

// returns 0 ok, 1 error
int ziren_exec_run(void* h, uint64_t max_cycles) {
  auto* ex = (Executor*)h;
  ex->max_cycles = max_cycles;
  ex->shard_start_pc = ex->pc;
  while (true) {
    bool done = ex->cycle();
    if (!ex->error.empty()) return 1;
    if (done) break;
  }
  if (ex->shard_size_) ex->bump_shard();  // close the final shard
  return 0;
}

void ziren_exec_set_shard_size(void* h, uint32_t s) {
  ((Executor*)h)->shard_size_ = s;
}

uint32_t ziren_exec_num_shards(void* h) {
  return (uint32_t)((Executor*)h)->shard_marks.size();
}

void ziren_exec_shard_marks(void* h, uint64_t* out) {
  auto* ex = (Executor*)h;
  for (size_t i = 0; i < ex->shard_marks.size(); i++) {
    out[3 * i] = ex->shard_marks[i].end_cycle;
    out[3 * i + 1] = ex->shard_marks[i].start_pc;
    out[3 * i + 2] = ex->shard_marks[i].next_pc;
  }
}

uint64_t ziren_exec_shard_blob_len(void* h, uint32_t i) {
  return ((Executor*)h)->shard_blobs.at(i).size();
}

void ziren_exec_shard_blob(void* h, uint32_t i, uint32_t* out) {
  auto& b = ((Executor*)h)->shard_blobs.at(i);
  memcpy(out, b.data(), b.size() * 4);
}

uint64_t ziren_exec_num_cycles(void* h) { return ((Executor*)h)->events.size(); }
uint64_t ziren_exec_global_clk(void* h) { return ((Executor*)h)->global_clk; }
uint32_t ziren_exec_exit_code(void* h) { return ((Executor*)h)->exit_code; }
int ziren_exec_exited(void* h) { return ((Executor*)h)->exited ? 1 : 0; }
uint32_t ziren_exec_pc(void* h) { return ((Executor*)h)->pc; }

const char* ziren_exec_error(void* h) { return ((Executor*)h)->error.c_str(); }

uint32_t ziren_exec_peek(void* h, uint32_t addr) { return ((Executor*)h)->peek(addr); }

uint32_t ziren_exec_num_committed(void* h) {
  return (uint32_t)((Executor*)h)->committed.size();
}
void ziren_exec_committed(void* h, uint32_t* out) {
  auto& c = ((Executor*)h)->committed;
  memcpy(out, c.data(), c.size() * 4);
}

uint32_t ziren_exec_stdout_len(void* h) {
  return (uint32_t)((Executor*)h)->stdout_buf.size();
}
void ziren_exec_stdout(void* h, uint8_t* out) {
  auto& s = ((Executor*)h)->stdout_buf;
  memcpy(out, s.data(), s.size());
}

uint32_t ziren_exec_pv_stream_len(void* h) {
  return (uint32_t)((Executor*)h)->public_values_stream.size();
}
void ziren_exec_pv_stream(void* h, uint8_t* out) {
  auto& s = ((Executor*)h)->public_values_stream;
  memcpy(out, s.data(), s.size());
}

// Columnar export: 11 cpu fields + 5 positions * 7 access fields = 46 cols.
// Caller provides a (num_cycles, 46) int64 buffer (C-contiguous).
void ziren_exec_events(void* h, int64_t* out) {
  auto* ex = (Executor*)h;
  size_t n = ex->events.size();
  for (size_t r = 0; r < n; r++) {
    const CycleEvent& e = ex->events[r];
    int64_t* row = out + r * 46;
    row[0] = e.clk; row[1] = e.pc; row[2] = e.next_pc; row[3] = e.next_next_pc;
    row[4] = e.instr_idx; row[5] = e.a; row[6] = e.b; row[7] = e.c;
    row[8] = e.prev_a; row[9] = e.exit_code; row[10] = e.syscall_code;
    for (int p = 0; p < 5; p++) {
      const Access& ac = e.acc[p];
      int64_t* f = row + 11 + p * 7;
      f[0] = ac.act; f[1] = ac.addr; f[2] = ac.prev_value; f[3] = ac.prev_clk;
      f[4] = ac.prev_shard; f[5] = ac.value; f[6] = ac.is_write;
    }
  }
}

// memory init/final events: touched addresses in first-touch order must be
// re-sorted by the caller; export (addr, init_value, final_shard, final_clk,
// final_value) rows.
uint32_t ziren_exec_num_touched(void* h) {
  return (uint32_t)((Executor*)h)->touch_order.size();
}
void ziren_exec_touched(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  size_t n = ex->touch_order.size();
  for (size_t i = 0; i < n; i++) {
    uint32_t addr = ex->touch_order[i];
    const MemRec& r = ex->memory[addr];
    uint32_t* row = out + i * 5;
    row[0] = addr;
    row[1] = ex->touched[addr];
    row[2] = r.shard;
    row[3] = r.clk;
    row[4] = r.value;
  }
}

uint32_t ziren_exec_num_p2_events(void* h) {
  return (uint32_t)((Executor*)h)->p2_events.size();
}
// rows of (shard, clk, ptr, 16 reads x5, 16 writes x5) = 163 u32 each
void ziren_exec_p2_events(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  for (size_t i = 0; i < ex->p2_events.size(); i++) {
    const PrecompileEvent& e = ex->p2_events[i];
    uint32_t* row = out + i * 163;
    row[0] = e.shard; row[1] = e.clk; row[2] = e.ptr;
    for (int k = 0; k < 16; k++) {
      const PrecompileAccess& a = e.reads[k];
      uint32_t* f = row + 3 + k * 5;
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
    }
    for (int k = 0; k < 16; k++) {
      const PrecompileAccess& a = e.writes[k];
      uint32_t* f = row + 83 + k * 5;
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
    }
  }
}

uint32_t ziren_exec_num_sha_ext_events(void* h) {
  return (uint32_t)((Executor*)h)->sha_ext_events.size();
}
void ziren_exec_sha_ext_events(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  for (size_t i = 0; i < ex->sha_ext_events.size(); i++) {
    const ShaExtendEvent& e = ex->sha_ext_events[i];
    uint32_t* row = out + i * 29;
    row[0] = e.shard; row[1] = e.clk; row[2] = e.ptr; row[3] = e.i;
    for (int k = 0; k < 4; k++) {
      const PrecompileAccess& a = e.reads[k];
      uint32_t* f = row + 4 + k * 5;
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
    }
    const PrecompileAccess& a = e.write;
    uint32_t* f = row + 24;
    f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
  }
}

uint32_t ziren_exec_num_u256_events(void* h) {
  return (uint32_t)((Executor*)h)->u256_events.size();
}
// rows of (shard, clk, x_ptr, y_ptr, 16 reads x5, 8 writes x5) = 124 u32 each
void ziren_exec_u256_events(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  for (size_t i = 0; i < ex->u256_events.size(); i++) {
    const Uint256Event& e = ex->u256_events[i];
    uint32_t* row = out + i * 124;
    row[0] = e.shard; row[1] = e.clk; row[2] = e.x_ptr; row[3] = e.y_ptr;
    for (int k = 0; k < 16; k++) {
      const PrecompileAccess& a = e.reads[k];
      uint32_t* f = row + 4 + k * 5;
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
    }
    for (int k = 0; k < 8; k++) {
      const PrecompileAccess& a = e.writes[k];
      uint32_t* f = row + 84 + k * 5;
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk; f[3] = a.prev_shard; f[4] = a.value;
    }
  }
}

// keccak events are variable length; exported as a packed u32 blob:
// per event [shard, clk, input_ptr, result_ptr, n_u32, len_read x5,
//            n_u32 reads x5, 16 writes x5]
uint32_t ziren_exec_keccak_blob_len(void* h) {
  auto* ex = (Executor*)h;
  uint64_t tot = 0;
  for (const auto& e : ex->keccak_events) tot += 5 + 5 + 5ull * e.n_u32 + 80;
  return (uint32_t)tot;
}
void ziren_exec_keccak_events(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  uint32_t* p = out;
  auto put = [&p](const PrecompileAccess& a) {
    *p++ = a.addr; *p++ = a.prev_value; *p++ = a.prev_clk;
    *p++ = a.prev_shard; *p++ = a.value;
  };
  for (const auto& e : ex->keccak_events) {
    *p++ = e.shard; *p++ = e.clk; *p++ = e.input_ptr; *p++ = e.result_ptr;
    *p++ = e.n_u32;
    put(e.len_read);
    for (const auto& a : e.reads) put(a);
    for (int i = 0; i < 16; i++) put(e.writes[i]);
  }
}

static std::string report_blob_cache;
uint32_t ziren_exec_report_blob_len(void* h) {
  auto* ex = (Executor*)h;
  std::string s;
  for (auto& kv : ex->cycle_tracker)
    s += "T " + kv.first + " " + std::to_string(kv.second) + "\n";
  for (auto& kv : ex->op_counts)
    s += "O " + std::to_string(kv.first) + " " + std::to_string(kv.second) + "\n";
  for (auto& kv : ex->sys_counts)
    s += "S " + std::to_string(kv.first) + " " + std::to_string(kv.second) + "\n";
  report_blob_cache = s;
  return (uint32_t)s.size();
}
void ziren_exec_report_blob(void* h, char* out) {
  memcpy(out, report_blob_cache.data(), report_blob_cache.size());
}

uint32_t ziren_exec_num_sha_cmp_events(void* h) {
  return (uint32_t)((Executor*)h)->sha_cmp_events.size();
}
// rows of (shard, clk, w_ptr, h_ptr, 8 h_reads x5, 64 w_reads x5, 8 h_writes x5)
// = 4 + 40 + 320 + 40 = 404 u32 each
void ziren_exec_sha_cmp_events(void* h, uint32_t* out) {
  auto* ex = (Executor*)h;
  for (size_t i = 0; i < ex->sha_cmp_events.size(); i++) {
    const ShaCompressEvent& e = ex->sha_cmp_events[i];
    uint32_t* row = out + i * 404;
    row[0] = e.shard; row[1] = e.clk; row[2] = e.w_ptr; row[3] = e.h_ptr;
    uint32_t* f = row + 4;
    auto put = [&](const PrecompileAccess& a) {
      f[0] = a.addr; f[1] = a.prev_value; f[2] = a.prev_clk;
      f[3] = a.prev_shard; f[4] = a.value; f += 5;
    };
    for (int k = 0; k < 8; k++) put(e.h_reads[k]);
    for (int k = 0; k < 64; k++) put(e.w_reads[k]);
    for (int k = 0; k < 8; k++) put(e.h_writes[k]);
  }
}

void ziren_exec_free(void* h) { delete (Executor*)h; }

}  // extern "C"
