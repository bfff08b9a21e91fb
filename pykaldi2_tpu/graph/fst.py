"""Minimal host-side weighted FST (tropical-ish, log-prob weights).

Replaces the slice of OpenFst that pykaldi2 actually exercises via graph
construction (SURVEY.md §3.2 "OpenFst"): mutable construction, composition,
connection (trim), epsilon removal for acceptors, and OpenFst-compatible
text-format IO. Weights here are **log-probs** (higher = better, additive
along paths) — the negation of OpenFst tropical costs; text IO negates on
the way in/out so `fstcompile`-style files interoperate.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict, deque
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

EPS = 0  # epsilon label, OpenFst convention


@dataclasses.dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float   # log-prob
    nextstate: int


class Fst:
    def __init__(self):
        self.arcs: List[List[Arc]] = []
        self.finals: Dict[int, float] = {}
        self.start: int = -1

    def add_state(self) -> int:
        self.arcs.append([])
        return len(self.arcs) - 1

    def set_start(self, s: int):
        self.start = s

    def set_final(self, s: int, weight: float = 0.0):
        self.finals[s] = weight

    def add_arc(self, s: int, ilabel: int, olabel: int, weight: float, nextstate: int):
        self.arcs[s].append(Arc(ilabel, olabel, weight, nextstate))

    @property
    def num_states(self) -> int:
        return len(self.arcs)

    @property
    def num_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    # -- algorithms -------------------------------------------------------

    def connect(self) -> "Fst":
        """Trim states not on a start→final path."""
        if self.start < 0:
            return Fst()
        fwd = {self.start}
        stack = [self.start]
        while stack:
            s = stack.pop()
            for a in self.arcs[s]:
                if a.nextstate not in fwd:
                    fwd.add(a.nextstate)
                    stack.append(a.nextstate)
        back = defaultdict(list)
        for s in range(self.num_states):
            for a in self.arcs[s]:
                back[a.nextstate].append(s)
        rev = set(self.finals)
        stack = list(self.finals)
        while stack:
            s = stack.pop()
            for p in back[s]:
                if p not in rev:
                    rev.add(p)
                    stack.append(p)
        keep = fwd & rev
        remap = {}
        out = Fst()
        for s in sorted(keep):
            remap[s] = out.add_state()
        if self.start in remap:
            out.set_start(remap[self.start])
        for s in sorted(keep):
            for a in self.arcs[s]:
                if a.nextstate in remap:
                    out.add_arc(remap[s], a.ilabel, a.olabel, a.weight, remap[a.nextstate])
            if s in self.finals:
                out.set_final(remap[s], self.finals[s])
        return out

    def compose(self, other: "Fst") -> "Fst":
        """self ∘ other: self's olabels matched against other's ilabels.

        Epsilon handling: simple epsilon-forwarding (sufficient for L∘G with
        epsilon word outputs); may create redundant (not incorrect) paths.
        """
        out = Fst()
        index: Dict[Tuple[int, int], int] = {}

        def state(a, b):
            if (a, b) not in index:
                index[(a, b)] = out.add_state()
            return index[(a, b)]

        if self.start < 0 or other.start < 0:
            return out
        out.set_start(state(self.start, other.start))
        queue = deque([(self.start, other.start)])
        seen = {(self.start, other.start)}
        # arc-index other's arcs by ilabel
        other_by_il: List[Dict[int, List[Arc]]] = []
        for s in range(other.num_states):
            d = defaultdict(list)
            for a in other.arcs[s]:
                d[a.ilabel].append(a)
            other_by_il.append(d)
        while queue:
            s1, s2 = queue.popleft()
            cur = state(s1, s2)
            if s1 in self.finals and s2 in other.finals:
                out.set_final(cur, self.finals[s1] + other.finals[s2])
            for a in self.arcs[s1]:
                if a.olabel == EPS:
                    nxt = (a.nextstate, s2)
                    out.add_arc(cur, a.ilabel, EPS, a.weight, state(*nxt))
                    if nxt not in seen:
                        seen.add(nxt)
                        queue.append(nxt)
                else:
                    for b in other_by_il[s2].get(a.olabel, ()):
                        nxt = (a.nextstate, b.nextstate)
                        out.add_arc(cur, a.ilabel, b.olabel, a.weight + b.weight, state(*nxt))
                        if nxt not in seen:
                            seen.add(nxt)
                            queue.append(nxt)
            for b in other.arcs[s2]:
                if b.ilabel == EPS:
                    nxt = (s1, b.nextstate)
                    out.add_arc(cur, EPS, b.olabel, b.weight, state(*nxt))
                    if nxt not in seen:
                        seen.add(nxt)
                        queue.append(nxt)
        return out.connect()

    def remove_input_epsilons(self) -> "Fst":
        """Eliminate ilabel==EPS arcs by epsilon-closure folding.

        Exact only for ACYCLIC epsilon subgraphs (which our builders
        produce); a cyclic epsilon subgraph would silently drop the cycle's
        weight mass, so it is rejected here instead (VERDICT r1)."""
        self._check_eps_acyclic()
        out = Fst()
        for _ in range(self.num_states):
            out.add_state()
        out.set_start(self.start)

        def closure(s):
            """[(state, weight, olabel_accumulated?)] — olabels must be EPS on folded arcs."""
            result = [(s, 0.0)]
            stack = [(s, 0.0)]
            seen = {s: 0.0}
            while stack:
                cur, w = stack.pop()
                for a in self.arcs[cur]:
                    if a.ilabel == EPS and a.olabel == EPS:
                        nw = w + a.weight
                        if a.nextstate not in seen or nw > seen[a.nextstate]:
                            seen[a.nextstate] = nw
                            result.append((a.nextstate, nw))
                            stack.append((a.nextstate, nw))
            return result

        for s in range(self.num_states):
            for (c, w) in closure(s):
                for a in self.arcs[c]:
                    if not (a.ilabel == EPS and a.olabel == EPS):
                        out.add_arc(s, a.ilabel, a.olabel, w + a.weight, a.nextstate)
                if c in self.finals:
                    prev = out.finals.get(s)
                    cand = w + self.finals[c]
                    if prev is None or cand > prev:
                        out.set_final(s, cand)
        return out.connect()

    def _check_eps_acyclic(self):
        """Raise if the eps/eps arc subgraph has a cycle (iterative DFS)."""
        WHITE, GRAY, BLACK = 0, 1, 2
        color = [WHITE] * self.num_states
        for root in range(self.num_states):
            if color[root] != WHITE:
                continue
            stack = [(root, 0)]
            color[root] = GRAY
            while stack:
                s, i = stack[-1]
                arcs = self.arcs[s]
                advanced = False
                while i < len(arcs):
                    a = arcs[i]
                    i += 1
                    if a.ilabel != EPS or a.olabel != EPS:
                        continue
                    if color[a.nextstate] == GRAY:
                        raise ValueError(
                            "epsilon cycle detected: remove_input_epsilons is "
                            "only exact for acyclic epsilon subgraphs")
                    if color[a.nextstate] == WHITE:
                        stack[-1] = (s, i)
                        stack.append((a.nextstate, 0))
                        color[a.nextstate] = GRAY
                        advanced = True
                        break
                if not advanced:
                    color[s] = BLACK
                    stack.pop()

    # -- IO ---------------------------------------------------------------

    def write_text(self, path: str):
        """OpenFst text format (costs = −log-prob)."""
        with open(path, "w") as f:
            def emit(s):
                for a in self.arcs[s]:
                    f.write(f"{s} {a.nextstate} {a.ilabel} {a.olabel} {-a.weight:.6f}\n")
                if s in self.finals:
                    f.write(f"{s} {-self.finals[s]:.6f}\n")
            if self.start >= 0:
                emit(self.start)
            for s in range(self.num_states):
                if s != self.start:
                    emit(s)

    @classmethod
    def read_text(cls, path: str) -> "Fst":
        fst = cls()
        first_state = None
        def need(s):
            while fst.num_states <= s:
                fst.add_state()
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if len(parts) >= 4:
                    s, ns, il, ol = (int(x) for x in parts[:4])
                    w = -float(parts[4]) if len(parts) > 4 else 0.0
                    need(max(s, ns))
                    fst.add_arc(s, il, ol, w, ns)
                else:
                    s = int(parts[0])
                    w = -float(parts[1]) if len(parts) > 1 else 0.0
                    need(s)
                    fst.set_final(s, w)
                if first_state is None:
                    first_state = s
        if first_state is not None:
            fst.set_start(first_state)
        return fst


def linear_acceptor(labels: Iterable[int], weight: float = 0.0) -> Fst:
    fst = Fst()
    s = fst.add_state()
    fst.set_start(s)
    for lab in labels:
        n = fst.add_state()
        fst.add_arc(s, lab, lab, weight, n)
        s = n
    fst.set_final(s, 0.0)
    return fst


def make_lexicon_fst(
    lexicon: Dict[str, List[List[int]]],
    word_ids: Dict[str, int],
    sil_phone: int = 0,
    sil_prob: float = 0.0,
) -> Fst:
    """L: phones in → words out, optional silence between words.

    lexicon: word → list of pronunciations (phone-id lists).
    sil_phone > 0 adds optional silence (prob sil_prob) at sentence start and
    after each word, like Kaldi's L_disambig-less lexicon.
    """
    fst = Fst()
    use_sil = sil_phone > 0 and sil_prob > 0.0
    # Kaldi L structure: after each word (and at sentence start), either take
    # optional silence with prob sil_prob or proceed directly with 1−sil_prob.
    wend = fst.add_state()        # start: "word boundary" state
    fst.set_start(wend)
    if use_sil:
        log_sil = float(np.log(sil_prob))
        log_nosil = float(np.log(1.0 - sil_prob))
        loop = fst.add_state()    # words begin here
        sil_state = fst.add_state()
        fst.add_arc(wend, EPS, EPS, log_nosil, loop)          # skip silence
        fst.add_arc(wend, sil_phone, EPS, log_sil, sil_state) # take silence
        fst.add_arc(sil_state, sil_phone, EPS, 0.0, sil_state)
        fst.add_arc(sil_state, EPS, EPS, 0.0, loop)
        fst.set_final(wend, 0.0)  # may end at a word boundary (opt. final sil)
        fst.set_final(sil_state, 0.0)
    else:
        loop = wend
        fst.set_final(loop, 0.0)
    for word, prons in lexicon.items():
        wid = word_ids[word]
        pron_w = float(np.log(1.0 / max(len(prons), 1)))
        for pron in prons:
            s = loop
            for i, ph in enumerate(pron):
                n = fst.add_state() if i < len(pron) - 1 else wend
                fst.add_arc(s, ph, wid if i == 0 else EPS,
                            pron_w if i == 0 else 0.0, n)
                s = n
            if not pron:  # empty pronunciation: eps arc
                fst.add_arc(loop, EPS, wid, pron_w, wend)
    return fst
