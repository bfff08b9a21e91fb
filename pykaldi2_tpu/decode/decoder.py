"""ctypes bindings for the native lattice decoder (native/latdec.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from pykaldi2_tpu.graph.fst import Fst
from pykaldi2_tpu.ops.fsa import DenseFsa

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblatdec.so")

_lib = None


def build_native(force: bool = False) -> str:
    """Build liblatdec.so with make if missing or stale; returns the path."""
    src = os.path.join(_NATIVE_DIR, "latdec.cc")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if force or stale:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_native())
    ip = ctypes.POINTER(ctypes.c_int)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.latdec_new.restype = ctypes.c_void_p
    lib.latdec_new.argtypes = [ctypes.c_int, ctypes.c_int, ip, ip, ip, ip, fp,
                               ctypes.c_int, fp, ctypes.c_float, ctypes.c_int,
                               ctypes.c_float]
    lib.latdec_free.argtypes = [ctypes.c_void_p]
    lib.latdec_decode.restype = ctypes.c_int
    lib.latdec_decode.argtypes = [ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_int,
                                  ip, ctypes.c_int, ip, fp]
    lib.latdec_decode_lattice.restype = ctypes.c_int
    lib.latdec_decode_lattice.argtypes = [
        ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_int,
        ip, ip, ip, fp, ctypes.c_int, ip, fp, ctypes.c_int, ip, fp, ip, ip]
    lib.latdec_search.restype = ctypes.c_int
    lib.latdec_search.argtypes = [ctypes.c_void_p, fp, ctypes.c_int,
                                  ctypes.c_int, ip, ip, fp]
    lib.latdec_emit_lattice.restype = ctypes.c_int
    lib.latdec_emit_lattice.argtypes = [
        ctypes.c_void_p, ip, ip, ip, fp, ctypes.c_int, ip, fp, ctypes.c_int,
        ip, ip, ip]
    lib.banded_trim_extract.restype = ctypes.c_int
    lib.banded_trim_extract.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ip, ip, ip, fp, ip, fp, ip, ctypes.c_float,
        ip, ip, ip, ip, ip, fp, ip, ip, ip]
    _lib = lib
    return lib


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class LatticeDecoder:
    """Beam decoder over a pdf-labeled FST (expand_to_pdf_fst output).

    Equivalent to the reference's MappedLatticeFasterRecognizer usage:
    feed acoustic-scaled pseudo-log-likelihoods, get words / alignments /
    time-synchronous lattices (as DenseFsa for on-device FB).
    """

    def __init__(self, graph, beam: float = 16.0, max_active: int = 7000,
                 lattice_beam: float = 8.0, word_penalty: float = 0.0):
        """graph: an ``Fst`` or a ``graph.vfst.VectorFst`` (HCLG-scale arc
        tables load without per-arc Python). word_penalty: insertion penalty
        added to every word-emitting arc (Kaldi's word insertion penalty,
        applied at graph load).

        Epsilon (ilabel==0) arcs are supported — the native decoder runs a
        within-frame closure — but must carry olabel==0 (word outputs live
        on emitting arcs in our builders); enforced here because the C++
        traceback only reads olabels off emitting arcs.
        """
        lib = _load()
        if isinstance(graph, Fst):
            src, dst, il, ol, wt = [], [], [], [], []
            for s in range(graph.num_states):
                for a in graph.arcs[s]:
                    src.append(s)
                    dst.append(a.nextstate)
                    il.append(a.ilabel)
                    ol.append(a.olabel)
                    wt.append(a.weight)
            src = np.asarray(src, np.int32)
            dst = np.asarray(dst, np.int32)
            il = np.asarray(il, np.int32)
            ol = np.asarray(ol, np.int32)
            wt = np.asarray(wt, np.float32)
            finals = np.full(graph.num_states, np.inf, np.float32)
            for s, w in graph.finals.items():
                finals[s] = -w
            num_states, start = graph.num_states, graph.start
        else:  # VectorFst-style arc table
            src, dst = graph.src, graph.dst
            il, ol = graph.ilabel, graph.olabel
            wt = graph.weight
            finals = np.where(np.isfinite(graph.final), -graph.final,
                              np.float32(np.inf)).astype(np.float32)
            num_states, start = graph.num_states, graph.start
        bad = (il == 0) & (ol != 0)
        if bad.any():
            raise ValueError(f"{int(bad.sum())} epsilon-input arcs carry word "
                             "olabels; push words onto emitting arcs first")
        cost = -wt + np.where(ol != 0, np.float32(word_penalty), np.float32(0.0))
        self._src = np.ascontiguousarray(src, np.int32)
        self._dst = np.ascontiguousarray(dst, np.int32)
        self._il = np.ascontiguousarray(il, np.int32)
        self._ol = np.ascontiguousarray(ol, np.int32)
        self._cost = np.ascontiguousarray(cost, np.float32)
        self._finals = np.ascontiguousarray(finals, np.float32)
        self._h = lib.latdec_new(
            num_states, start, _iptr(self._src), _iptr(self._dst),
            _iptr(self._il), _iptr(self._ol), _fptr(self._cost),
            len(self._src), _fptr(self._finals),
            ctypes.c_float(beam), int(max_active), ctypes.c_float(lattice_beam))
        self._lib = lib

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.latdec_free(self._h)
            self._h = None

    def decode(self, loglikes: np.ndarray) -> Tuple[List[int], np.ndarray, float]:
        """loglikes [T, P] (scaled) → (word ids, per-frame pdfs [T], log score)."""
        ll = np.ascontiguousarray(loglikes, np.float32)
        t, p = ll.shape
        max_words = t + 1
        words = np.zeros(max_words, np.int32)
        pdfs = np.zeros(t, np.int32)
        score = ctypes.c_float()
        n = self._lib.latdec_decode(self._h, _fptr(ll), t, p, _iptr(words),
                                    max_words, _iptr(pdfs), ctypes.byref(score))
        if n < 0:
            raise RuntimeError("decoding failed (no surviving tokens — widen beam?)")
        return words[:n].tolist(), pdfs, float(score.value)

    def decode_lattice(self, loglikes: np.ndarray, with_frames: bool = False):
        """loglikes [T, P] → (time-synchronous lattice as DenseFsa, best score).

        The lattice's arc weights are graph scores only; run it through
        ops/fb with the same obs matrix to get den posteriors (the decoded-
        lattice mode). ``with_frames=True`` additionally returns each
        lattice state's frame index [S] (states partition by frame) for the
        banded kernels in ops/fb_lattice.py.
        """
        ll = np.ascontiguousarray(loglikes, np.float32)
        t, p = ll.shape
        # search once — it reports the exact lattice size, emit fills
        # exactly-sized buffers (the old capacity-guess retry loop re-ran
        # the whole search 2-3x per utterance on dense lattices)
        n_arcs = ctypes.c_int()
        n_states = ctypes.c_int()
        score = ctypes.c_float()
        rc = self._lib.latdec_search(self._h, _fptr(ll), t, p,
                                     ctypes.byref(n_arcs),
                                     ctypes.byref(n_states),
                                     ctypes.byref(score))
        if rc != 0:
            raise RuntimeError("lattice decoding failed (no surviving tokens)")
        na, ns = n_arcs.value, n_states.value
        src = np.zeros(na, np.int32)
        dst = np.zeros(na, np.int32)
        pdf = np.zeros(na, np.int32)
        w = np.zeros(na, np.float32)
        finals = np.zeros(ns, np.float32)
        frames = np.zeros(ns, np.int32)
        olabel = np.zeros(na, np.int32)
        rc = self._lib.latdec_emit_lattice(
            self._h, _iptr(src), _iptr(dst), _iptr(pdf), _fptr(w), na,
            ctypes.byref(n_arcs), _fptr(finals), ns, ctypes.byref(n_states),
            _iptr(frames), _iptr(olabel))
        if rc != 0:
            raise RuntimeError(f"lattice emit failed (rc={rc})")
        fsa = DenseFsa(ns, src, dst, pdf, w, finals, 0, olabel=olabel)
        if with_frames:
            return fsa.validate(), frames, float(score.value)
        return fsa.validate(), float(score.value)
