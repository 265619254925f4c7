// Boolean-circuit scheduler for batched homomorphic evaluation.
//
// The TPU compute path bootstraps thousands of ciphertexts per launch;
// serving a boolean circuit therefore wants gates grouped into the widest
// possible independent "waves" (same gate kind, no data dependence), not
// evaluated one by one as the reference's PoC drivers do.  This native
// module owns the graph work the Python layer shouldn't:
//
//   * circuit construction (wire/gate tables, C ABI for ctypes);
//   * Kahn levelization into dependency levels;
//   * wave extraction: per level, gates partitioned by kind so each wave
//     maps to ONE batched gate call (one fused blind-rotation launch);
//   * a criticality heuristic (longest-path-to-output) so waves inside a
//     level are emitted most-critical-first, letting a pipelined executor
//     overlap the tail.
//
// The Python side (tfhe_tpu/runtime/scheduler.py) feeds each wave to the
// batched boolean gate API (boot/gate.py).  Gate kinds mirror that API:
// NOT and constants are free (no bootstrap) and scheduled like wires.
//
// Exported C ABI (all int32):
//   circ_new(n_inputs) -> handle
//   circ_gate(h, kind, a, b) -> wire id       (b ignored for NOT/CONST)
//   circ_mux(h, c, x, y) -> wire id
//   circ_schedule(h) -> n_waves; then circ_wave(h, i, out_kind, out_gates,
//     out_count) fills gate ids of wave i (capacity-checked)
//   circ_gate_info(h, g, out5): kind, a, b, c, out_wire
//   circ_free(h)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <vector>

enum Kind : int32_t {
  K_INPUT = 0,
  K_AND = 1,
  K_OR = 2,
  K_XOR = 3,
  K_NAND = 4,
  K_NOR = 5,
  K_XNOR = 6,
  K_NOT = 7,      // free (negation)
  K_CONST0 = 8,   // free (trivial sample)
  K_CONST1 = 9,
  K_MUX = 10,     // three bootstraps in gate.py's formulation
  K_BINARY = 11,  // wave kind only: mixed 2-input boolean gates
};

struct Gate {
  int32_t kind;
  int32_t a, b, c;     // input wire ids (-1 unused)
  int32_t out;         // output wire id
  int32_t level;       // dependency level (inputs/frees fold into users)
  int32_t crit;        // longest path to any output
};

struct Circuit {
  int32_t n_inputs;
  int32_t n_wires;
  std::vector<Gate> gates;                 // bootstrap gates only
  std::vector<int32_t> wire_src;           // wire -> producing gate (-1 input)
  // free ops are folded: wire -> (base wire, negated, is_const, const_val)
  struct WireRef { int32_t base; bool neg; bool is_const; bool cval; };
  std::vector<WireRef> ref;
  // schedule
  std::vector<std::vector<int32_t>> waves; // gate ids per wave
  std::vector<int32_t> wave_kind;
  bool scheduled = false;

  explicit Circuit(int32_t n) : n_inputs(n), n_wires(n) {
    wire_src.resize(n, -1);
    ref.resize(n);
    for (int32_t i = 0; i < n; ++i) ref[i] = {i, false, false, false};
  }

  int32_t new_wire(int32_t src_gate) {
    wire_src.push_back(src_gate);
    ref.push_back({n_wires, false, false, false});
    return n_wires++;
  }
};

static std::map<int32_t, Circuit*> g_circ;
static int32_t g_next = 1;

extern "C" {

int32_t circ_new(int32_t n_inputs) {
  g_circ[g_next] = new Circuit(n_inputs);
  return g_next++;
}

void circ_free(int32_t h) {
  auto it = g_circ.find(h);
  if (it != g_circ.end()) { delete it->second; g_circ.erase(it); }
}

int32_t circ_gate(int32_t h, int32_t kind, int32_t a, int32_t b) {
  Circuit* c = g_circ.at(h);
  if (kind == K_CONST0 || kind == K_CONST1) {
    int32_t w = c->new_wire(-1);
    c->ref[w] = {-1, false, true, kind == K_CONST1};
    return w;
  }
  if (kind == K_NOT) {
    // fold: NOT of const -> const; NOT of wire -> negated alias
    auto r = c->ref[a];
    int32_t w = c->new_wire(-1);
    if (r.is_const) c->ref[w] = {-1, false, true, !r.cval};
    else            c->ref[w] = {r.base, !r.neg, false, false};
    return w;
  }
  int32_t g = (int32_t)c->gates.size();
  int32_t w = c->new_wire(g);
  c->gates.push_back({kind, a, b, -1, w, 0, 0});
  return w;
}

int32_t circ_mux(int32_t h, int32_t cc, int32_t x, int32_t y) {
  Circuit* c = g_circ.at(h);
  int32_t g = (int32_t)c->gates.size();
  int32_t w = c->new_wire(g);
  c->gates.push_back({K_MUX, cc, x, y, w, 0, 0});
  return w;
}

// Kahn levelization over bootstrap gates (frees are transparent).
int32_t circ_schedule(int32_t h) {
  Circuit* c = g_circ.at(h);
  const int32_t n = (int32_t)c->gates.size();
  std::vector<std::vector<int32_t>> users(n);
  std::vector<int32_t> indeg(n, 0);

  auto producer = [&](int32_t wire) -> int32_t {
    auto r = c->ref[wire];
    if (r.is_const || r.base < 0) return -1;
    return c->wire_src[r.base];          // -1 for circuit inputs
  };

  for (int32_t g = 0; g < n; ++g) {
    int32_t ins[3] = {c->gates[g].a, c->gates[g].b, c->gates[g].c};
    for (int32_t w : ins) {
      if (w < 0) continue;
      int32_t p = producer(w);
      if (p >= 0) { users[p].push_back(g); indeg[g]++; }
    }
  }
  std::queue<int32_t> q;
  for (int32_t g = 0; g < n; ++g)
    if (indeg[g] == 0) { c->gates[g].level = 0; q.push(g); }
  int32_t max_level = -1;
  while (!q.empty()) {
    int32_t g = q.front(); q.pop();
    if (c->gates[g].level > max_level) max_level = c->gates[g].level;
    for (int32_t u : users[g]) {
      if (c->gates[u].level < c->gates[g].level + 1)
        c->gates[u].level = c->gates[g].level + 1;
      if (--indeg[u] == 0) q.push(u);
    }
  }
  // criticality: longest path to a sink, by reverse level sweep
  for (int32_t g = n - 1; g >= 0; --g) {
    int32_t m = 0;
    for (int32_t u : users[g])
      if (c->gates[u].crit + 1 > m) m = c->gates[u].crit + 1;
    c->gates[g].crit = m;
  }
  // waves: every 2-input boolean gate is bootstrap(c0 + w1*x + w2*y) with
  // per-gate constants (boot/gate.py), so ALL binary kinds of a level
  // merge into ONE K_BINARY wave — one fused blind-rotation launch per
  // level instead of one per (level, kind), and one executor compile per
  // wave WIDTH instead of per (kind, width).  MUX (3 bootstraps) stays a
  // separate wave.  Most-critical bucket first within a level.
  c->waves.clear();
  c->wave_kind.clear();
  for (int32_t lv = 0; lv <= max_level; ++lv) {
    std::vector<int32_t> binary, mux;
    int32_t bcrit = 0, mcrit = 0;
    for (int32_t g = 0; g < n; ++g)
      if (c->gates[g].level == lv) {
        if (c->gates[g].kind == K_MUX) {
          mux.push_back(g);
          if (c->gates[g].crit > mcrit) mcrit = c->gates[g].crit;
        } else {
          binary.push_back(g);
          if (c->gates[g].crit > bcrit) bcrit = c->gates[g].crit;
        }
      }
    const bool mux_first = !mux.empty() && mcrit > bcrit;
    for (int pass = 0; pass < 2; ++pass) {
      if ((pass == 0) == mux_first) {
        if (!mux.empty()) {
          c->waves.push_back(mux);
          c->wave_kind.push_back(K_MUX);
        }
      } else if (!binary.empty()) {
        c->waves.push_back(binary);
        c->wave_kind.push_back(K_BINARY);
      }
    }
  }
  c->scheduled = true;
  return (int32_t)c->waves.size();
}

int32_t circ_wave(int32_t h, int32_t i, int32_t* out_kind,
                  int32_t* out_gates, int32_t capacity) {
  Circuit* c = g_circ.at(h);
  if (!c->scheduled || i < 0 || i >= (int32_t)c->waves.size()) return -1;
  auto& wv = c->waves[i];
  if ((int32_t)wv.size() > capacity) return -(int32_t)wv.size();
  *out_kind = c->wave_kind[i];
  std::memcpy(out_gates, wv.data(), wv.size() * sizeof(int32_t));
  return (int32_t)wv.size();
}

void circ_gate_info(int32_t h, int32_t g, int32_t* out5) {
  Circuit* c = g_circ.at(h);
  const Gate& gg = c->gates[g];
  out5[0] = gg.kind; out5[1] = gg.a; out5[2] = gg.b; out5[3] = gg.c;
  out5[4] = gg.out;
}

// wire resolution for the executor: base wire id (-1 const), negated flag,
// const value
void circ_wire_ref(int32_t h, int32_t wire, int32_t* out3) {
  Circuit* c = g_circ.at(h);
  auto r = c->ref[wire];
  out3[0] = r.is_const ? -1 : r.base;
  out3[1] = r.neg ? 1 : 0;
  out3[2] = r.cval ? 1 : 0;
}

int32_t circ_n_gates(int32_t h) { return (int32_t)g_circ.at(h)->gates.size(); }
int32_t circ_n_wires(int32_t h) { return g_circ.at(h)->n_wires; }

}  // extern "C"
