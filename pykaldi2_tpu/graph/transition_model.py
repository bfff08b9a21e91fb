"""TransitionModel: (phone, hmm-state, pdf) tuples + transition-id mapping.

Reference behavior: kaldi/src/hmm/transition-model.{h,cc} (SURVEY.md §3.2
"Kaldi HMM/transition model"). Provides the tid→pdf / tid→phone lookup arrays
the data and loss layers need (device-resident int32 arrays), transition
probabilities for graph weights, and best-effort binary interchange with
Kaldi ``final.mdl`` files (modern <Tuples> format; uniform topologies).

Conventions match Kaldi: phones are 1-based; transition-ids are 1-based;
pdf-ids are 0-based.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.graph.topology import HmmState, HmmTopology


class TransitionModel:
    """Built from a topology + a (phone, pdf_class)→pdf-id map.

    ``pdf_map`` defaults to context-independent numbering: consecutive pdf-ids
    over sorted (phone, pdf_class).
    """

    def __init__(self, topo: HmmTopology, pdf_map: Optional[Dict[Tuple[int, int], int]] = None):
        self.topo = topo
        if pdf_map is None:
            pdf_map = {}
            nxt = 0
            for p in topo.phones:
                for c in range(topo.num_pdf_classes(p)):
                    pdf_map[(p, c)] = nxt
                    nxt += 1
        self.pdf_map = pdf_map
        # tuples[i] = (phone, hmm_state, pdf) for tuple-index i (0-based)
        self.tuples: List[Tuple[int, int, int]] = []
        self._tuple_index: Dict[Tuple[int, int], int] = {}
        for p in topo.phones:
            for j, st in enumerate(topo.states_for(p)):
                self._tuple_index[(p, j)] = len(self.tuples)
                self.tuples.append((p, j, pdf_map[(p, st.pdf_class)]))
        # transition-ids: 1-based, ordered by tuple then transition index
        self._tid2tuple: List[int] = [0]        # dummy for tid 0
        self._tid2trans: List[int] = [0]
        self._state2tid_offset: Dict[int, int] = {}
        for i, (p, j, _pdf) in enumerate(self.tuples):
            self._state2tid_offset[i] = len(self._tid2tuple)
            for k, _ in enumerate(topo.states_for(p)[j].transitions):
                self._tid2tuple.append(i)
                self._tid2trans.append(k)
        self.num_tids = len(self._tid2tuple) - 1
        self.num_pdfs = 1 + max(pdf for _, _, pdf in self.tuples)
        # log transition probs per tid (1-based; index 0 unused)
        self.log_probs = np.zeros(self.num_tids + 1, np.float32)
        for tid in range(1, self.num_tids + 1):
            p, j, _ = self.tuples[self._tid2tuple[tid]]
            k = self._tid2trans[tid]
            self.log_probs[tid] = np.log(topo.states_for(p)[j].transitions[k][1])

    # -- lookups ----------------------------------------------------------

    def tid_to_pdf_array(self) -> np.ndarray:
        """[num_tids+1] int32; index 0 → -1 (invalid)."""
        out = np.full(self.num_tids + 1, -1, np.int32)
        for tid in range(1, self.num_tids + 1):
            out[tid] = self.tuples[self._tid2tuple[tid]][2]
        return out

    def tid_to_phone_array(self) -> np.ndarray:
        out = np.full(self.num_tids + 1, -1, np.int32)
        for tid in range(1, self.num_tids + 1):
            out[tid] = self.tuples[self._tid2tuple[tid]][0]
        return out

    def tid_is_self_loop_array(self) -> np.ndarray:
        out = np.zeros(self.num_tids + 1, bool)
        for tid in range(1, self.num_tids + 1):
            p, j, _ = self.tuples[self._tid2tuple[tid]]
            k = self._tid2trans[tid]
            out[tid] = self.topo.states_for(p)[j].transitions[k][0] == j
        return out

    def tids_for_state(self, phone: int, hmm_state: int) -> List[int]:
        i = self._tuple_index[(phone, hmm_state)]
        p, j, _ = self.tuples[i]
        off = self._state2tid_offset[i]
        return [off + k for k in range(len(self.topo.states_for(p)[j].transitions))]

    def pdf_for(self, phone: int, hmm_state: int) -> int:
        return self.tuples[self._tuple_index[(phone, hmm_state)]][2]

    def transition(self, phone: int, hmm_state: int, k: int) -> Tuple[int, float, int]:
        """(next_hmm_state, log_prob, tid) for transition k of a state."""
        i = self._tuple_index[(phone, hmm_state)]
        tid = self._state2tid_offset[i] + k
        nxt = self.topo.states_for(phone)[hmm_state].transitions[k][0]
        return nxt, float(self.log_probs[tid]), tid

    # -- Kaldi final.mdl interchange (best effort) ------------------------

    def write_kaldi(self, path: str):
        """Binary final.mdl-compatible write (modern <Tuples> format)."""
        with open(path, "wb") as f:
            f.write(kaldi_io.BINARY_MARKER)
            f.write(b"<TransitionModel> ")
            self._write_topo(f)
            f.write(b"<Tuples> ")
            f.write(b"\x04" + struct.pack("<i", len(self.tuples)))
            for (p, j, pdf) in self.tuples:
                st = self.topo.states_for(p)[j]
                fwd_pdf = self_pdf = pdf
                f.write(b"\x04" + struct.pack("<i", p))
                f.write(b"\x04" + struct.pack("<i", j))
                f.write(b"\x04" + struct.pack("<i", fwd_pdf))
                f.write(b"\x04" + struct.pack("<i", self_pdf))
            f.write(b"</Tuples> ")
            f.write(b"<LogProbs> ")
            kaldi_io.write_vector(f, self.log_probs.astype(np.float32))
            f.write(b"</LogProbs> ")
            f.write(b"</TransitionModel> ")

    def _write_topo(self, f):
        f.write(b"<Topology> ")
        phones = self.topo.phones
        kaldi_io.write_int_vector(f, np.asarray(phones, np.int32))
        # phone2idx: 1-based phone → entry index; entries unique per phone here
        max_p = max(phones)
        phone2idx = np.full(max_p + 1, -1, np.int32)
        for i, p in enumerate(phones):
            phone2idx[p] = i
        kaldi_io.write_int_vector(f, phone2idx)
        f.write(b"\x04" + struct.pack("<i", len(phones)))
        for p in phones:
            states = self.topo.states_for(p)
            # +1 for the implicit non-emitting final state
            f.write(b"\x04" + struct.pack("<i", len(states) + 1))
            for st in states:
                f.write(b"\x04" + struct.pack("<i", st.pdf_class))  # forward_pdf_class
                f.write(b"\x04" + struct.pack("<i", st.pdf_class))  # self_loop_pdf_class
                f.write(b"\x04" + struct.pack("<i", len(st.transitions)))
                for (nxt, prob) in st.transitions:
                    f.write(b"\x04" + struct.pack("<i", nxt))
                    f.write(b"\x04" + struct.pack("<f", prob))
            # final state: no pdf classes, no transitions
            f.write(b"\x04" + struct.pack("<i", -1))
            f.write(b"\x04" + struct.pack("<i", -1))
            f.write(b"\x04" + struct.pack("<i", 0))
        f.write(b"</Topology> ")

    @classmethod
    def read_kaldi(cls, path: str) -> "TransitionModel":
        """Parse a binary final.mdl written by this class or modern Kaldi."""
        with open(path, "rb") as f:
            if f.read(2) != kaldi_io.BINARY_MARKER:
                raise ValueError("final.mdl must be binary")
            _expect_token(f, "<TransitionModel>")
            topo = cls._read_topo(f)
            tok = _read_token(f)
            tuples = []
            if tok == "<Tuples>":
                n = _read_int(f)
                for _ in range(n):
                    p = _read_int(f)
                    j = _read_int(f)
                    fwd_pdf = _read_int(f)
                    _self_pdf = _read_int(f)
                    tuples.append((p, j, fwd_pdf))
                _expect_token(f, "</Tuples>")
            elif tok == "<Triples>":
                n = _read_int(f)
                for _ in range(n):
                    tuples.append((_read_int(f), _read_int(f), _read_int(f)))
                _expect_token(f, "</Triples>")
            else:
                raise ValueError(f"unexpected token {tok!r}")
            _expect_token(f, "<LogProbs>")
            log_probs = kaldi_io.read_vector(f)
            _expect_token(f, "</LogProbs>")
        pdf_map = {}
        for (p, j, pdf) in tuples:
            cls_id = topo.states_for(p)[j].pdf_class
            pdf_map[(p, cls_id)] = pdf
        tm = cls(topo, pdf_map)
        if tm.num_tids == len(log_probs) - 1:
            tm.log_probs = log_probs.astype(np.float32)
        return tm

    @staticmethod
    def _read_topo(f) -> HmmTopology:
        _expect_token(f, "<Topology>")
        phones = kaldi_io.read_int_vector(f)
        phone2idx = kaldi_io.read_int_vector(f)
        n_entries = _read_int(f)
        entry_list = []
        for _ in range(n_entries):
            n_states = _read_int(f)
            states = []
            for j in range(n_states):
                fwd_cls = _read_int(f)
                self_cls = _read_int(f)
                if fwd_cls >= 0 and self_cls != fwd_cls:
                    raise ValueError(
                        "topology entry with forward_pdf_class != "
                        "self_loop_pdf_class (chain-style): not supported")
                n_trans = _read_int(f)
                trans = [(_read_int(f), _read_float(f)) for _ in range(n_trans)]
                if fwd_cls >= 0:
                    states.append(HmmState(fwd_cls, trans))
            entry_list.append(states)
        _expect_token(f, "</Topology>")
        # real Kaldi shares one entry across many phones (n_entries can be
        # < n_phones): map each phone through phone2idx, NOT positionally
        # (kaldi/src/hmm/hmm-topology.cc layout; ADVICE round 1)
        entries = {}
        for p in phones:
            p = int(p)
            idx = int(phone2idx[p]) if p < len(phone2idx) else -1
            if idx < 0 or idx >= n_entries:
                raise ValueError(f"phone {p} has no topology entry (phone2idx={idx})")
            # copy so per-phone mutation never aliases a shared entry
            entries[p] = [HmmState(s.pdf_class, list(s.transitions)) for s in entry_list[idx]]
        return HmmTopology(entries)


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return tok.decode()


def _expect_token(f, want: str):
    got = _read_token(f)
    if got != want:
        raise ValueError(f"expected {want!r}, got {got!r}")


def _read_int(f) -> int:
    sz = f.read(1)
    if sz != b"\x04":
        raise ValueError(f"bad int marker {sz!r}")
    return struct.unpack("<i", f.read(4))[0]


def _read_float(f) -> float:
    sz = f.read(1)
    if sz != b"\x04":
        raise ValueError(f"bad float marker {sz!r}")
    return struct.unpack("<f", f.read(4))[0]
