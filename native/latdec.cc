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
};

struct Link {           // an incoming arc alternative
  int prev;             // token index in previous frame
  int arc;              // EMITTING graph arc id this link entered through
  float cost;           // total path cost via this link
  float graph_cost;     // emitting arc cost + accumulated epsilon costs
};

struct Token {
  float cost;           // best cost (== alts front's cost)
  int state;
  std::vector<Link> alts;  // kept links, alts[0] is the best
};

struct Decoder {
  Graph g;
  float beam = 16.0f;
  int max_active = 7000;
  float lattice_beam = 8.0f;
  std::vector<std::vector<Token>> frames;
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
  return d;
}

void latdec_free(void* h) { delete static_cast<Decoder*>(h); }

namespace {

// Within-frame epsilon closure (Kaldi ProcessNonemitting): Dijkstra-style
// relaxation over ilabel==0 arcs. Each propagated link keeps its original
// emitting arc and accumulates the epsilon graph cost, so lattices remain
// time-synchronous. Re-queues only on strict cost improvement, so zero-cost
// epsilon cycles terminate.
void EpsClosure(const Graph& g, std::vector<Token>& toks,
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
        size_t n_src = toks[i].alts.size();
        for (size_t k = 0; k < n_src; ++k) {
          Link l = toks[i].alts[k];  // copy: push may not alias the source
          float lc = l.cost + w;
          if (lc <= std::min(c, toks[ti].cost) + lattice_beam)
            toks[ti].alts.push_back({l.prev, l.arc, lc, l.graph_cost + w});
        }
        if (improved) {
          Token& tk = toks[ti];
          tk.cost = c;
          int best = 0;
          for (int k = 1; k < (int)tk.alts.size(); ++k)
            if (tk.alts[k].cost < tk.alts[best].cost) best = k;
          if (best != 0) std::swap(tk.alts[0], tk.alts[best]);
          queue.push_back(ti);
        }
      }
    }
  }
}

int RunSearch(Decoder* d, const float* loglikes, int T, int P,
              float* best_final_cost_out) {
  Decoder& dec = *d;
  const Graph& g = dec.g;
  dec.frames.assign(T + 1, {});
  dec.frames[0].push_back({0.0f, g.start, {}});

  std::vector<int> state_tok(g.num_states, -1);
  std::vector<int> touched;

  // initial epsilon closure (graphs may have eps arcs out of the start)
  state_tok[g.start] = 0;
  touched.push_back(g.start);
  EpsClosure(g, dec.frames[0], state_tok, touched, dec.beam, dec.lattice_beam);
  for (int s : touched) state_tok[s] = -1;
  touched.clear();

  for (int t = 0; t < T; ++t) {
    const std::vector<Token>& cur = dec.frames[t];
    std::vector<Token>& nxt = dec.frames[t + 1];
    const float* obs = loglikes + (size_t)t * P;
    touched.clear();
    float frame_best = kInf;

    for (int i = 0; i < (int)cur.size(); ++i) {
      const Token& tok = cur[i];
      for (int e = g.eps_end[tok.state]; e < g.row_off[tok.state + 1]; ++e) {
        int pdf = g.ilabel[e] - 1;
        if (pdf < 0 || pdf >= P) continue;  // guard corrupt negative ilabels
        float c = tok.cost + g.cost[e] - obs[pdf];
        // running beam: once any good path exists this frame, skip hopeless
        // expansions before they allocate tokens (Kaldi adaptive-cutoff-ish)
        if (c > frame_best + dec.beam) continue;
        int s2 = g.dst[e];
        int ti = state_tok[s2];
        if (ti < 0) {
          state_tok[s2] = (int)nxt.size();
          touched.push_back(s2);
          nxt.push_back({c, s2, {{i, e, c, g.cost[e]}}});
        } else {
          Token& tk = nxt[ti];
          tk.alts.push_back({i, e, c, g.cost[e]});
          if (c < tk.cost) {
            tk.cost = c;
            std::swap(tk.alts.front(), tk.alts.back());
          }
        }
        if (c < frame_best) frame_best = c;
      }
    }
    // epsilon closure before pruning so eps-reachable states compete fairly
    EpsClosure(g, nxt, state_tok, touched, frame_best + dec.beam,
               dec.lattice_beam);
    float cutoff = frame_best + dec.beam;
    if ((int)nxt.size() > dec.max_active) {
      std::vector<float> costs;
      costs.reserve(nxt.size());
      for (auto& tk : nxt) costs.push_back(tk.cost);
      std::nth_element(costs.begin(), costs.begin() + dec.max_active - 1, costs.end());
      cutoff = std::min(cutoff, costs[dec.max_active - 1]);
    }
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

// Lattice decode: emits the pruned time-synchronous arc table (state 0 =
// start). state_frame (if non-null, state_capacity ints) gets each lattice
// state's frame index — states partition by frame, which the banded
// [B, max_active] forward-backward kernels exploit (ops/fb_lattice.py).
// Returns 0 ok, -1 search failure, -2 capacity too small.
int latdec_decode_lattice(void* h, const float* loglikes, int T, int P,
                          int* lat_src, int* lat_dst, int* lat_pdf,
                          float* lat_weight, int arc_capacity,
                          int* num_arcs_out, float* final_weights,
                          int state_capacity, int* num_states_out,
                          float* best_score, int* state_frame,
                          int* lat_olabel) {
  auto* d = static_cast<Decoder*>(h);
  float best_cost;
  int best_i = RunSearch(d, loglikes, T, P, &best_cost);
  if (best_i < 0) return -1;
  *best_score = -best_cost;

  int next_id = 1;
  std::vector<std::vector<int>> ids(T + 1);
  ids[0].assign(d->frames[0].size(), 0);
  if (state_frame != nullptr) state_frame[0] = 0;
  for (int t = 1; t <= T; ++t) {
    float fb = kInf;
    for (auto& tk : d->frames[t]) fb = std::min(fb, tk.cost);
    ids[t].assign(d->frames[t].size(), -1);
    for (int i = 0; i < (int)d->frames[t].size(); ++i) {
      if (d->frames[t][i].cost <= fb + d->lattice_beam) {
        if (next_id >= state_capacity) return -2;
        if (state_frame != nullptr) state_frame[next_id] = t;
        ids[t][i] = next_id++;
      }
    }
  }
  *num_states_out = next_id;
  for (int s = 0; s < next_id; ++s) final_weights[s] = -kInf;

  int n_arcs = 0;
  for (int t = 1; t <= T; ++t) {
    for (int i = 0; i < (int)d->frames[t].size(); ++i) {
      if (ids[t][i] < 0) continue;
      const Token& tok = d->frames[t][i];
      for (const Link& l : tok.alts) {
        int prev = ids[t - 1][l.prev];
        if (prev < 0) continue;
        if (n_arcs >= arc_capacity) return -2;
        lat_src[n_arcs] = prev;
        lat_dst[n_arcs] = ids[t][i];
        lat_pdf[n_arcs] = d->g.ilabel[l.arc] - 1;
        if (lat_olabel != nullptr) lat_olabel[n_arcs] = d->g.olabel[l.arc];
        // graph_cost folds in epsilon arcs taken after the emitting arc;
        // frame-0 tokens all map to lattice state 0, so initial-epsilon
        // costs (pure graph, no acoustics yet) move onto the first arc
        lat_weight[n_arcs] =
            -(l.graph_cost + (t == 1 ? d->frames[0][l.prev].cost : 0.0f));
        ++n_arcs;
      }
    }
  }
  *num_arcs_out = n_arcs;
  bool any_final = false;
  for (int i = 0; i < (int)d->frames[T].size(); ++i) {
    int id = ids[T][i];
    if (id < 0) continue;
    float fc = d->g.final_cost[d->frames[T][i].state];
    if (!std::isinf(fc)) {
      final_weights[id] = -fc;
      any_final = true;
    }
  }
  if (!any_final) {  // fallback: every surviving end token is final, weight 0
    for (int i = 0; i < (int)d->frames[T].size(); ++i)
      if (ids[T][i] >= 0) final_weights[ids[T][i]] = 0.0f;
  }
  return 0;
}

}  // extern "C"
