// Beam-pruned token-passing Viterbi decoder with time-synchronous lattice
// output.
//
// TPU-native equivalent of kaldi/src/decoder/lattice-faster-decoder.{h,cc}
// as used by pykaldi2 through kaldi.asr.MappedLatticeFasterRecognizer
// (SURVEY.md §3.2 "Kaldi decoder"): the host decodes pruned lattices over an
// HCLG-style pdf-labeled graph fed with scaled log-likelihoods; the heavy
// forward-backward math stays on the TPU (the lattice comes back as a dense
// arc table consumed by ops/fb.py). Like Kaldi, each token keeps the
// alternative incoming links within the lattice beam, not just the Viterbi
// backpointer, so the emitted lattice contains competing paths.
//
// Graph convention (from pykaldi2_tpu.graph.compile.expand_to_pdf_fst /
// expand_to_pdf_vfst):
//   - arcs: src, dst, ilabel = pdf+1 (0 = epsilon), olabel = word,
//     cost = -log-prob graph weight
//   - epsilon (ilabel == 0) arcs are traversed within a frame by a
//     Dijkstra-style closure (Kaldi's ProcessNonemitting) — they carry
//     word-LM backoff and junction weights in HCLG-scale graphs and MUST
//     have olabel == 0 (the Python wrapper enforces this): each lattice
//     link records one emitting arc plus the accumulated epsilon graph
//     cost, keeping lattices time-synchronous for the on-device FB kernels.
//   - final_cost[state] = -log-prob final weight (+inf = non-final)
// Observation matrix: loglikes[t*P + pdf], already acoustic-scaled.
//
// C ABI only (consumed via ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Graph {
  int num_states = 0;
  int start = 0;
  std::vector<int> row_off;  // CSR by src; eps arcs first within each row
  std::vector<int> eps_end;  // per state: end of the eps-arc range
  std::vector<int> dst, ilabel, olabel;
  std::vector<float> cost;
  std::vector<float> final_cost;
  // topological position of each state in the eps subgraph (sum-exact
  // closure processes tokens in this order); eps_cyclic falls back to the
  // queue closure, which is Viterbi-exact but collapses parallel eps routes
  std::vector<int> eps_topo_pos;
  bool eps_cyclic = false;
};

struct Link {           // an incoming arc alternative
  int prev;             // token index in previous frame
  int arc;              // EMITTING graph arc id this link entered through
  float cost;           // total path cost via this link
  float graph_cost;     // emitting arc cost + accumulated epsilon costs
};

struct Token {
  float cost;           // best (Viterbi) cost (== alts front's cost)
  float cost0_sum;      // frame-0 closure only: log-sum-folded cost over all
                        // initial eps routes (== cost elsewhere); the t==1
                        // emit folds THIS into the first arc so parallel
                        // pre-frame-0 eps routes keep their full mass
  int state;
  std::vector<Link> alts;  // kept links, alts[0] is the best
};

struct Exp {                // one emitting-arc relaxation (pass-1 scratch)
  float cost;
  int prev;                 // token index in previous frame
  int arc;                  // graph arc id
};

struct Decoder {
  Graph g;
  float beam = 16.0f;
  int max_active = 7000;
  float lattice_beam = 8.0f;
  std::vector<std::vector<Token>> frames;
  std::vector<Exp> scratch;        // reused across frames/utterances
  std::vector<float> state_cost;   // per-state best emitting cost this frame
  std::vector<float> minima;       // nth_element scratch
  // cached by latdec_search for latdec_emit_lattice (no re-search on
  // capacity growth): lattice state ids per (frame, token), arc/state counts
  std::vector<std::vector<int>> ids;
  int search_T = -1;
  int lat_states = 0;
  int lat_arcs = 0;
  float best_cost = kInf;
};

}  // namespace

extern "C" {

void* latdec_new(int num_states, int start, const int* src, const int* dst,
                 const int* ilabel, const int* olabel, const float* cost,
                 int num_arcs, const float* final_cost, float beam,
                 int max_active, float lattice_beam) {
  auto* d = new Decoder();
  d->beam = beam;
  d->max_active = max_active;
  d->lattice_beam = lattice_beam;
  Graph& g = d->g;
  g.num_states = num_states;
  g.start = start;
  g.final_cost.assign(final_cost, final_cost + num_states);
  std::vector<int> count(num_states + 1, 0);
  std::vector<int> eps_count(num_states, 0);
  for (int e = 0; e < num_arcs; ++e) {
    count[src[e] + 1]++;
    if (ilabel[e] == 0) eps_count[src[e]]++;
  }
  g.row_off.resize(num_states + 1);
  g.row_off[0] = 0;
  for (int s = 0; s < num_states; ++s) g.row_off[s + 1] = g.row_off[s] + count[s + 1];
  g.eps_end.resize(num_states);
  for (int s = 0; s < num_states; ++s) g.eps_end[s] = g.row_off[s] + eps_count[s];
  g.dst.resize(num_arcs);
  g.ilabel.resize(num_arcs);
  g.olabel.resize(num_arcs);
  g.cost.resize(num_arcs);
  // eps arcs first within each row: the closure walks only [row_off, eps_end)
  // and the emission loop only [eps_end, row_off+1) — no per-arc label tests
  std::vector<int> fill_eps(num_states), fill_emit(num_states);
  for (int s = 0; s < num_states; ++s) {
    fill_eps[s] = g.row_off[s];
    fill_emit[s] = g.eps_end[s];
  }
  for (int e = 0; e < num_arcs; ++e) {
    int pos = (ilabel[e] == 0) ? fill_eps[src[e]]++ : fill_emit[src[e]]++;
    g.dst[pos] = dst[e];
    g.ilabel[pos] = ilabel[e];
    g.olabel[pos] = olabel[e];
    g.cost[pos] = cost[e];
  }
  // Kahn topological order over the eps subgraph. Self-loops count as
  // cycles: a zero-cost eps self-loop carries divergent sum mass, so such
  // graphs use the queue closure (Viterbi-exact) instead.
  {
    std::vector<int> indeg(num_states, 0);
    bool self_loop = false;
    for (int s = 0; s < num_states; ++s)
      for (int e = g.row_off[s]; e < g.eps_end[s]; ++e) {
        if (g.dst[e] == s) self_loop = true;
        else indeg[g.dst[e]]++;
      }
    g.eps_topo_pos.assign(num_states, 0);
    std::vector<int> stack;
    stack.reserve(num_states);
    for (int s = 0; s < num_states; ++s)
      if (indeg[s] == 0) stack.push_back(s);
    int done = 0;
    while (!stack.empty()) {
      int s = stack.back();
      stack.pop_back();
      g.eps_topo_pos[s] = done++;
      for (int e = g.row_off[s]; e < g.eps_end[s]; ++e) {
        if (g.dst[e] == s) continue;
        if (--indeg[g.dst[e]] == 0) stack.push_back(g.dst[e]);
      }
    }
    g.eps_cyclic = self_loop || done != num_states;
  }
  return d;
}

void latdec_free(void* h) { delete static_cast<Decoder*>(h); }

namespace {

// -log(e^-a + e^-b): fold two path costs into their sum-semiring total.
inline float LogAddCost(float a, float b) {
  float lo = std::min(a, b), hi = std::max(a, b);
  if (std::isinf(lo)) return lo < 0 ? lo : hi;  // +inf operand: other wins
  return lo - std::log1p(std::exp(lo - hi));
}

// Within-frame epsilon closure (Kaldi ProcessNonemitting). Each propagated
// link keeps its original emitting arc and accumulates the epsilon graph
// cost, so lattices remain time-synchronous.
//
// Acyclic eps subgraphs (every graph our builders emit) use the SUM-EXACT
// topo-order pass: tokens are processed in eps-topological order, so every
// eps route is traversed exactly once; parallel routes reaching the same
// (prev, arc) link fold their lattice mass by LogAddCost while the Viterbi
// cost min-folds — the emitted lattice then carries the full sum-semiring
// mass (host logZ == ground truth; Kaldi gets the same result by keeping
// eps arcs explicit in its lattices). Cyclic eps subgraphs fall back to
// the Dijkstra-style queue pass below, which is Viterbi-exact and
// terminates on zero-cost cycles but collapses parallel eps routes to
// their cheapest representative.

void EpsClosureTopo(const Graph& g, std::vector<Token>& toks,
                    std::vector<int>& state_tok, std::vector<int>& touched,
                    float cutoff, float lattice_beam) {
  // min-heap of (eps topo position, token index); every token whose state
  // has eps out-arcs enters exactly once. Pops are monotone in topo
  // position (new tokens are always created downstream of the current
  // min), so each token's cost/links/mass are FINAL when it propagates.
  std::priority_queue<std::pair<int, int>, std::vector<std::pair<int, int>>,
                      std::greater<std::pair<int, int>>>
      heap;
  for (int i = 0; i < (int)toks.size(); ++i) {
    int s = toks[i].state;
    if (g.eps_end[s] > g.row_off[s]) heap.push({g.eps_topo_pos[s], i});
  }
  while (!heap.empty()) {
    int i = heap.top().second;
    heap.pop();
    int s = toks[i].state;
    float base = toks[i].cost;
    for (int e = g.row_off[s]; e < g.eps_end[s]; ++e) {
      float w = g.cost[e];
      float c = base + w;
      if (c > cutoff) continue;
      int s2 = g.dst[e];
      int ti = state_tok[s2];
      if (ti < 0) {
        Token nt;
        nt.cost = c;
        nt.cost0_sum = toks[i].cost0_sum + w;
        nt.state = s2;
        nt.alts.reserve(toks[i].alts.size());
        for (const Link& l : toks[i].alts)
          if (l.cost + w <= c + lattice_beam)
            nt.alts.push_back({l.prev, l.arc, l.cost + w, l.graph_cost + w});
        state_tok[s2] = (int)toks.size();
        touched.push_back(s2);
        toks.push_back(std::move(nt));
        if (g.eps_end[s2] > g.row_off[s2])
          heap.push({g.eps_topo_pos[s2], (int)toks.size() - 1});
      } else {
        Token& tk = toks[ti];
        bool improved = c < tk.cost;
        tk.cost0_sum = LogAddCost(tk.cost0_sum, toks[i].cost0_sum + w);
        size_t n_src = toks[i].alts.size();
        for (size_t k = 0; k < n_src; ++k) {
          Link l = toks[i].alts[k];  // copy: push may not alias the source
          float lc = l.cost + w;
          if (lc > std::min(c, tk.cost) + lattice_beam) continue;
          Link* existing = nullptr;
          for (Link& e2 : tk.alts)
            if (e2.prev == l.prev && e2.arc == l.arc) { existing = &e2; break; }
          if (existing != nullptr) {
            // parallel eps routes to the same link: Viterbi cost min-folds,
            // lattice mass sum-folds. alts[0] stays the best link: lc >= c
            // >= tk.cost, so the update can never beat the current front.
            existing->cost = std::min(existing->cost, lc);
            existing->graph_cost =
                LogAddCost(existing->graph_cost, l.graph_cost + w);
          } else {
            tk.alts.push_back({l.prev, l.arc, lc, l.graph_cost + w});
          }
        }
        if (improved) {
          tk.cost = c;
          int best = 0;
          for (int k = 1; k < (int)tk.alts.size(); ++k)
            if (tk.alts[k].cost < tk.alts[best].cost) best = k;
          if (best != 0) std::swap(tk.alts[0], tk.alts[best]);
        }
        // no re-queue: ti is still in the heap (or has no eps out-arcs)
      }
    }
  }
}

// Fallback for cyclic eps subgraphs: Dijkstra-style worklist. Re-queues on
// cost improvement AND on new-link arrival (multi-hop alternative mass),
// with (prev, arc) dedup-keep-cheapest making re-propagation idempotent:
// an append is a new pair (finitely many per token) and an in-place update
// strictly lowers that link's cost, so zero-cost epsilon cycles reach a
// fixed point where every candidate is a dedup skip.
void EpsClosureQueue(const Graph& g, std::vector<Token>& toks,
                     std::vector<int>& state_tok, std::vector<int>& touched,
                     float cutoff, float lattice_beam) {
  std::vector<int> queue;
  queue.reserve(toks.size());
  for (int i = 0; i < (int)toks.size(); ++i) queue.push_back(i);
  while (!queue.empty()) {
    int i = queue.back();
    queue.pop_back();
    int s = toks[i].state;
    float base = toks[i].cost;
    for (int e = g.row_off[s]; e < g.eps_end[s]; ++e) {
      float w = g.cost[e];
      float c = base + w;
      if (c > cutoff) continue;
      int s2 = g.dst[e];
      if (s2 == s) continue;  // eps self-loop: never improves
      int ti = state_tok[s2];
      if (ti < 0) {
        Token nt;
        nt.cost = c;
        nt.cost0_sum = c;
        nt.state = s2;
        nt.alts.reserve(toks[i].alts.size());
        for (const Link& l : toks[i].alts)
          if (l.cost + w <= c + lattice_beam)
            nt.alts.push_back({l.prev, l.arc, l.cost + w, l.graph_cost + w});
        state_tok[s2] = (int)toks.size();
        touched.push_back(s2);
        toks.push_back(std::move(nt));
        queue.push_back((int)toks.size() - 1);
      } else if (ti != i) {
        bool improved = c < toks[ti].cost;
        bool added = false;
        size_t n_src = toks[i].alts.size();
        for (size_t k = 0; k < n_src; ++k) {
          Link l = toks[i].alts[k];  // copy: push may not alias the source
          float lc = l.cost + w;
          if (lc > std::min(c, toks[ti].cost) + lattice_beam) continue;
          Link* existing = nullptr;
          for (Link& e2 : toks[ti].alts)
            if (e2.prev == l.prev && e2.arc == l.arc) { existing = &e2; break; }
          if (existing != nullptr) {
            if (existing->cost <= lc) continue;
            existing->cost = lc;
            existing->graph_cost = l.graph_cost + w;
          } else {
            toks[ti].alts.push_back({l.prev, l.arc, lc, l.graph_cost + w});
          }
          added = true;
        }
        if (improved) {
          Token& tk = toks[ti];
          tk.cost = c;
          tk.cost0_sum = c;
          int best = 0;
          for (int k = 1; k < (int)tk.alts.size(); ++k)
            if (tk.alts[k].cost < tk.alts[best].cost) best = k;
          if (best != 0) std::swap(tk.alts[0], tk.alts[best]);
        }
        if (improved || added) queue.push_back(ti);
      }
    }
  }
}

inline void EpsClosure(const Graph& g, std::vector<Token>& toks,
                       std::vector<int>& state_tok, std::vector<int>& touched,
                       float cutoff, float lattice_beam) {
  if (g.eps_cyclic)
    EpsClosureQueue(g, toks, state_tok, touched, cutoff, lattice_beam);
  else
    EpsClosureTopo(g, toks, state_tok, touched, cutoff, lattice_beam);
}

int RunSearch(Decoder* d, const float* loglikes, int T, int P,
              float* best_final_cost_out) {
  Decoder& dec = *d;
  const Graph& g = dec.g;
  dec.frames.assign(T + 1, {});
  dec.frames[0].push_back({0.0f, 0.0f, g.start, {}});

  std::vector<int> state_tok(g.num_states, -1);
  std::vector<int> touched;

  // initial epsilon closure (graphs may have eps arcs out of the start)
  state_tok[g.start] = 0;
  touched.push_back(g.start);
  EpsClosure(g, dec.frames[0], state_tok, touched, dec.beam,
             dec.lattice_beam);
  for (int s : touched) state_tok[s] = -1;
  touched.clear();

  if ((int)dec.state_cost.size() != g.num_states)
    dec.state_cost.assign(g.num_states, kInf);

  for (int t = 0; t < T; ++t) {
    const std::vector<Token>& cur = dec.frames[t];
    std::vector<Token>& nxt = dec.frames[t + 1];
    const float* obs = loglikes + (size_t)t * P;
    touched.clear();
    float frame_best = kInf;

    // pass 1: relax every emitting arc into POD scratch, tracking per-state
    // minima — no token/link allocation yet, so expansions doomed by the
    // beam or max_active cutoffs cost only a 12-byte append
    std::vector<Exp>& scratch = dec.scratch;
    std::vector<float>& state_cost = dec.state_cost;
    scratch.clear();
    for (int i = 0; i < (int)cur.size(); ++i) {
      const Token& tok = cur[i];
      for (int e = g.eps_end[tok.state]; e < g.row_off[tok.state + 1]; ++e) {
        int pdf = g.ilabel[e] - 1;
        if (pdf < 0 || pdf >= P) continue;  // guard corrupt negative ilabels
        float c = tok.cost + g.cost[e] - obs[pdf];
        // running beam: skip hopeless expansions as soon as any good path
        // exists this frame (Kaldi adaptive-cutoff-ish)
        if (c > frame_best + dec.beam) continue;
        int s2 = g.dst[e];
        if (state_cost[s2] == kInf) touched.push_back(s2);
        if (c < state_cost[s2]) state_cost[s2] = c;
        scratch.push_back({c, i, e});
        if (c < frame_best) frame_best = c;
      }
    }
    // exact pre-closure max_active cutoff over per-state minima (Kaldi
    // GetCutoff): states beyond it never materialize tokens at all
    float cutoff_emit = frame_best + dec.beam;
    if ((int)touched.size() > dec.max_active) {
      std::vector<float>& minima = dec.minima;
      minima.clear();
      for (int s : touched) minima.push_back(state_cost[s]);
      std::nth_element(minima.begin(), minima.begin() + dec.max_active - 1,
                       minima.end());
      cutoff_emit = std::min(cutoff_emit, minima[dec.max_active - 1]);
    }
    // pass 2: tokens for surviving states; links filtered by the lattice
    // beam against the (final, pre-closure) per-state best
    {
      int w = 0;
      for (int s : touched) {
        if (state_cost[s] <= cutoff_emit) {
          state_tok[s] = (int)nxt.size();
          nxt.push_back({state_cost[s], state_cost[s], s, {}});
          touched[w++] = s;
        } else {
          state_cost[s] = kInf;  // reset dropped states now
        }
      }
      touched.resize(w);
    }
    for (const Exp& x : scratch) {
      int s2 = g.dst[x.arc];
      int ti = state_tok[s2];
      if (ti < 0 || x.cost > state_cost[s2] + dec.lattice_beam) continue;
      Token& tk = nxt[ti];
      tk.alts.push_back({x.prev, x.arc, x.cost, g.cost[x.arc]});
      if (x.cost == tk.cost && tk.alts.size() > 1)
        std::swap(tk.alts.front(), tk.alts.back());
    }
    for (int s : touched) state_cost[s] = kInf;
    // epsilon closure before pruning so eps-reachable states compete
    // fairly; bounded by the max_active-tightened emitting cutoff (Kaldi
    // ProcessNonemitting reuses ProcessEmitting's cutoff the same way)
    EpsClosure(g, nxt, state_tok, touched, cutoff_emit, dec.lattice_beam);
    float cutoff = cutoff_emit;
    if ((int)nxt.size() > dec.max_active) {
      std::vector<float>& costs = dec.minima;
      costs.clear();
      for (auto& tk : nxt) costs.push_back(tk.cost);
      std::nth_element(costs.begin(), costs.begin() + dec.max_active - 1, costs.end());
      cutoff = std::min(cutoff, costs[dec.max_active - 1]);
    }
    {
      std::vector<Token> kept;
      kept.reserve(nxt.size());
      for (auto& tk : nxt) {
        if (tk.cost > cutoff) continue;
        // prune link alternatives to the lattice beam, dedup by (prev, arc)
        // keeping the cheapest (eps relaxation can produce duplicates)
        std::vector<Link> keep_alts;
        for (auto& l : tk.alts)
          if (l.cost <= tk.cost + dec.lattice_beam) keep_alts.push_back(l);
        std::sort(keep_alts.begin(), keep_alts.end(),
                  [](const Link& a, const Link& b) {
                    if (a.prev != b.prev) return a.prev < b.prev;
                    if (a.arc != b.arc) return a.arc < b.arc;
                    return a.cost < b.cost;
                  });
        keep_alts.erase(
            std::unique(keep_alts.begin(), keep_alts.end(),
                        [](const Link& a, const Link& b) {
                          return a.prev == b.prev && a.arc == b.arc;
                        }),
            keep_alts.end());
        std::sort(keep_alts.begin(), keep_alts.end(),
                  [](const Link& a, const Link& b) { return a.cost < b.cost; });
        tk.alts.swap(keep_alts);
        kept.push_back(std::move(tk));
      }
      nxt.swap(kept);
    }
    for (int s : touched) state_tok[s] = -1;
    if (nxt.empty()) return -1;
  }

  float best = kInf;
  int best_i = -1;
  const std::vector<Token>& last = dec.frames[T];
  for (int i = 0; i < (int)last.size(); ++i) {
    float fc = g.final_cost[last[i].state];
    if (std::isinf(fc)) continue;
    float c = last[i].cost + fc;
    if (c < best) { best = c; best_i = i; }
  }
  if (best_i < 0) {  // Kaldi-style fallback: no final state reached
    for (int i = 0; i < (int)last.size(); ++i)
      if (last[i].cost < best) { best = last[i].cost; best_i = i; }
  }
  *best_final_cost_out = best;
  return best_i;
}

}  // namespace

// Best-path decode. Returns number of output words (>=0) or -1 on failure.
int latdec_decode(void* h, const float* loglikes, int T, int P, int* out_words,
                  int max_words, int* out_pdfs, float* out_score) {
  auto* d = static_cast<Decoder*>(h);
  float best_cost;
  int best_i = RunSearch(d, loglikes, T, P, &best_cost);
  if (best_i < 0) return -1;
  *out_score = -best_cost;
  std::vector<int> words;
  int i = best_i;
  for (int t = T; t > 0; --t) {
    const Token& tok = d->frames[t][i];
    const Link& l = tok.alts.front();
    out_pdfs[t - 1] = d->g.ilabel[l.arc] - 1;
    int ol = d->g.olabel[l.arc];
    if (ol != 0) words.push_back(ol);
    i = l.prev;
  }
  std::reverse(words.begin(), words.end());
  int n = std::min((int)words.size(), max_words);
  if (n > 0) std::memcpy(out_words, words.data(), n * sizeof(int));
  return (int)words.size() <= max_words ? n : -2;
}

// Run the search and size the pruned lattice WITHOUT emitting it: returns 0
// (then *num_arcs_out / *num_states_out are the exact emit sizes) or -1 on
// search failure. The search result stays cached in the handle so
// latdec_emit_lattice never re-searches — capacity negotiation used to cost
// 2-3 full extra searches per utterance through the old combined entry.
int latdec_search(void* h, const float* loglikes, int T, int P,
                  int* num_arcs_out, int* num_states_out, float* best_score) {
  auto* d = static_cast<Decoder*>(h);
  int best_i = RunSearch(d, loglikes, T, P, &d->best_cost);
  d->search_T = -1;
  if (best_i < 0) return -1;
  *best_score = -d->best_cost;

  int next_id = 1;
  d->ids.assign(T + 1, {});
  d->ids[0].assign(d->frames[0].size(), 0);
  int n_arcs = 0;
  for (int t = 1; t <= T; ++t) {
    float fb = kInf;
    for (auto& tk : d->frames[t]) fb = std::min(fb, tk.cost);
    d->ids[t].assign(d->frames[t].size(), -1);
    for (int i = 0; i < (int)d->frames[t].size(); ++i) {
      if (d->frames[t][i].cost <= fb + d->lattice_beam)
        d->ids[t][i] = next_id++;
    }
    for (int i = 0; i < (int)d->frames[t].size(); ++i) {
      if (d->ids[t][i] < 0) continue;
      for (const Link& l : d->frames[t][i].alts)
        if (d->ids[t - 1][l.prev] >= 0) ++n_arcs;
    }
  }
  d->search_T = T;
  d->lat_states = next_id;
  d->lat_arcs = n_arcs;
  *num_states_out = next_id;
  *num_arcs_out = n_arcs;
  return 0;
}

// Emit the lattice cached by latdec_search: the pruned time-synchronous arc
// table (state 0 = start). state_frame (if non-null, state_capacity ints)
// gets each lattice state's frame index — states partition by frame, which
// the banded [B, max_active] forward-backward kernels exploit
// (ops/fb_lattice.py). Returns 0 ok, -2 capacity too small / no search.
int latdec_emit_lattice(void* h, int* lat_src, int* lat_dst, int* lat_pdf,
                        float* lat_weight, int arc_capacity,
                        int* num_arcs_out, float* final_weights,
                        int state_capacity, int* num_states_out,
                        int* state_frame, int* lat_olabel) {
  auto* d = static_cast<Decoder*>(h);
  int T = d->search_T;
  if (T < 0 || d->lat_arcs > arc_capacity || d->lat_states > state_capacity)
    return -2;
  if (state_frame != nullptr) {
    state_frame[0] = 0;
    for (int t = 1; t <= T; ++t)
      for (int id : d->ids[t])
        if (id >= 0) state_frame[id] = t;
  }
  *num_states_out = d->lat_states;
  for (int s = 0; s < d->lat_states; ++s) final_weights[s] = -kInf;

  int n_arcs = 0;
  for (int t = 1; t <= T; ++t) {
    for (int i = 0; i < (int)d->frames[t].size(); ++i) {
      if (d->ids[t][i] < 0) continue;
      const Token& tok = d->frames[t][i];
      for (const Link& l : tok.alts) {
        int prev = d->ids[t - 1][l.prev];
        if (prev < 0) continue;
        lat_src[n_arcs] = prev;
        lat_dst[n_arcs] = d->ids[t][i];
        lat_pdf[n_arcs] = d->g.ilabel[l.arc] - 1;
        if (lat_olabel != nullptr) lat_olabel[n_arcs] = d->g.olabel[l.arc];
        // graph_cost folds in epsilon arcs taken after the emitting arc;
        // frame-0 tokens all map to lattice state 0, so initial-epsilon
        // costs (pure graph, no acoustics yet) move onto the first arc —
        // cost0_sum: the SUM-folded mass over parallel initial eps routes
        lat_weight[n_arcs] =
            -(l.graph_cost + (t == 1 ? d->frames[0][l.prev].cost0_sum : 0.0f));
        ++n_arcs;
      }
    }
  }
  *num_arcs_out = n_arcs;
  bool any_final = false;
  for (int i = 0; i < (int)d->frames[T].size(); ++i) {
    int id = d->ids[T][i];
    if (id < 0) continue;
    float fc = d->g.final_cost[d->frames[T][i].state];
    if (!std::isinf(fc)) {
      final_weights[id] = -fc;
      any_final = true;
    }
  }
  if (!any_final) {  // fallback: every surviving end token is final, weight 0
    for (int i = 0; i < (int)d->frames[T].size(); ++i)
      if (d->ids[T][i] >= 0) final_weights[d->ids[T][i]] = 0.0f;
  }
  return 0;
}

// Combined entry (legacy ABI): search + emit in one call.
// Returns 0 ok, -1 search failure, -2 capacity too small.
int latdec_decode_lattice(void* h, const float* loglikes, int T, int P,
                          int* lat_src, int* lat_dst, int* lat_pdf,
                          float* lat_weight, int arc_capacity,
                          int* num_arcs_out, float* final_weights,
                          int state_capacity, int* num_states_out,
                          float* best_score, int* state_frame,
                          int* lat_olabel) {
  int na, ns;
  int rc = latdec_search(h, loglikes, T, P, &na, &ns, best_score);
  if (rc != 0) return rc;
  return latdec_emit_lattice(h, lat_src, lat_dst, lat_pdf, lat_weight,
                             arc_capacity, num_arcs_out, final_weights,
                             state_capacity, num_states_out, state_frame,
                             lat_olabel);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Banded-lattice epilogue for the ON-DEVICE decoder
// (pykaldi2_tpu.decode.device_lattice.banded_to_fsas): trim the [B, T, A]
// band arc table to final-reaching states and extract per-utterance DenseFsa
// arrays. The numpy formulation of this pass is gather-bound (nine ~5M-row
// random np.take calls, ~2.8 s warm at B=16/T=300/A=1024 worst-case
// density); one C pass over the bands is cache-friendly and removes the
// dev_eval host bottleneck. Semantics mirror the numpy path exactly
// (liveness scatter, backward trim, degenerate fallback to forward
// liveness, per-utterance state renumbering in (t, slot) order).
// ---------------------------------------------------------------------------

extern "C" {

// src/dst/pdf: [B, T, A] slot-indexed band arcs; w: [B, T, A] (<= thresh =
// padding); ol: optional [B, T, A] (NULL = no olabels); fin: [B, K] final
// weights (<= thresh = non-final); nf: [B] frame counts.
// Outputs (caller-allocated):
//   n_states/n_arcs: [B]
//   out_src/out_dst/out_pdf/out_w(/out_ol): [B, T*A] capacity, fsa arcs
//   out_frames: [B, (T+1)*K] capacity, frame index per kept state
//   out_final_sid: [B, K], state id of each last-frame alive slot else -1
// Returns 0.
int banded_trim_extract(int b, int t_dim, int a_dim, int k,
                        const int* src, const int* dst, const int* pdf,
                        const float* w, const int* ol, const float* fin,
                        const int* nf, float thresh,
                        int* n_states, int* n_arcs,
                        int* out_src, int* out_dst, int* out_pdf,
                        float* out_w, int* out_ol,
                        int* out_frames, int* out_final_sid) {
  std::vector<uint8_t> live, alive;
  std::vector<int> sid;
  const int64_t ta = (int64_t)t_dim * a_dim;
  for (int i = 0; i < b; ++i) {
    int T = nf[i];
    if (T < 0) T = 0;
    if (T > t_dim) T = t_dim;
    const int64_t grid = (int64_t)(T + 1) * k;
    live.assign(grid, 0);
    alive.assign(grid, 0);
    const int* s_i = src + i * ta;
    const int* d_i = dst + i * ta;
    const int* p_i = pdf + i * ta;
    const float* w_i = w + i * ta;
    const int* o_i = ol ? ol + i * ta : nullptr;
    // forward liveness
    live[0] = 1;  // slot 0 at t=0 (the start token)
    for (int t = 0; t < T; ++t) {
      const float* wt = w_i + (int64_t)t * a_dim;
      const int* dt = d_i + (int64_t)t * a_dim;
      uint8_t* lv = live.data() + (int64_t)(t + 1) * k;
      for (int a = 0; a < a_dim; ++a)
        if (wt[a] > thresh) lv[dt[a]] = 1;
    }
    // backward trim to final-reaching states
    {
      const uint8_t* lv = live.data() + (int64_t)T * k;
      uint8_t* al = alive.data() + (int64_t)T * k;
      const float* f_i = fin + (int64_t)i * k;
      for (int s = 0; s < k; ++s) al[s] = lv[s] && (f_i[s] > thresh);
    }
    for (int t = T - 1; t >= 0; --t) {
      const float* wt = w_i + (int64_t)t * a_dim;
      const int* st = s_i + (int64_t)t * a_dim;
      const int* dt = d_i + (int64_t)t * a_dim;
      const uint8_t* an = alive.data() + (int64_t)(t + 1) * k;
      uint8_t* at = alive.data() + (int64_t)t * k;
      for (int a = 0; a < a_dim; ++a)
        if (wt[a] > thresh && an[dt[a]]) at[st[a]] = 1;
    }
    for (int64_t j = 0; j < grid; ++j) alive[j] &= live[j];
    if (!alive[0]) alive = live;  // degenerate: band overflow cut all paths
    // state numbering in (t, slot) order
    sid.assign(grid, -1);
    int ns = 0;
    int* frames_i = out_frames + (int64_t)i * (t_dim + 1) * k;
    for (int t = 0; t <= T; ++t) {
      const uint8_t* at = alive.data() + (int64_t)t * k;
      int64_t base = (int64_t)t * k;
      for (int s = 0; s < k; ++s)
        if (at[s]) {
          sid[base + s] = ns;
          frames_i[ns++] = t;
        }
    }
    n_states[i] = ns;
    // arc extraction
    int64_t na = 0;
    int* os = out_src + i * ta;
    int* od = out_dst + i * ta;
    int* op = out_pdf + i * ta;
    float* ow = out_w + i * ta;
    int* oo = out_ol ? out_ol + i * ta : nullptr;
    for (int t = 0; t < T; ++t) {
      const float* wt = w_i + (int64_t)t * a_dim;
      const int* st = s_i + (int64_t)t * a_dim;
      const int* dt = d_i + (int64_t)t * a_dim;
      const int* pt = p_i + (int64_t)t * a_dim;
      const int* ot = o_i ? o_i + (int64_t)t * a_dim : nullptr;
      const int* sid_t = sid.data() + (int64_t)t * k;
      const int* sid_n = sid.data() + (int64_t)(t + 1) * k;
      for (int a = 0; a < a_dim; ++a) {
        if (wt[a] <= thresh) continue;
        int ss = sid_t[st[a]], dd = sid_n[dt[a]];
        if (ss < 0 || dd < 0) continue;
        os[na] = ss;
        od[na] = dd;
        op[na] = pt[a];
        ow[na] = wt[a];
        if (oo) oo[na] = ot[a];
        ++na;
      }
    }
    n_arcs[i] = (int)na;
    // last-frame slot -> state id (for final weights)
    int* fs = out_final_sid + (int64_t)i * k;
    const int* sid_T = sid.data() + (int64_t)T * k;
    for (int s = 0; s < k; ++s) fs[s] = sid_T[s];
  }
  return 0;
}

}  // extern "C"
