"""Multi-host SPMD serving: host 0 owns HTTP + sampling, followers mirror.

The reference is strictly single-process (SURVEY.md §5.8); multi-host serving
is new north-star territory. The execution model:

  * every process initializes jax.distributed and holds a shard of the
    global (dp, tp) mesh; jitted steps are SPMD — ALL processes must enter
    the same computation with the same global shapes,
  * host 0 runs the host-side state machines (Session, Sampler, HTTP) and
    BROADCASTS each engine call (decode chunk / KV edit / clear) over DCN
    before executing it, so followers replay the identical call sequence
    (`HostLoop`, an Instance proxy),
  * followers sit in `follow()` consuming broadcasts until OP_STOP.

Failure policy (SURVEY.md §5.3 — the reference imposes nothing): an engine
step that raises on host 0 is followed by an OP_CLEAR broadcast, so every
host's KV cache resets to a consistent empty state; the in-flight request
gets the error surfaced (HTTP 500 at the edge) and the server stays up.
In-flight generation state is lost — callers needing checkpoint/resume
across failures use the Session state snapshot (Session.cpp:284-310 analog).

`initialize()` wires jax.distributed (TPU env autodetection or explicit
localhost coordination for tests); `global_mesh()` builds the (dp, tp) mesh
over all global devices. tests/test_multihost.py exercises one full
complete + verify round trip across 2 localhost CPU processes.
"""

from __future__ import annotations

import numpy as np

import jax

from .mesh import make_mesh

OP_DECODE = 1
OP_CLEAR = 2
OP_STOP = 3
OP_SEQ_RM = 4
OP_SEQ_ADD = 5
OP_SEQ_DIV = 6

# -- generic variable-size op broadcast (scheduler protocol) -----------------
# Frame = fixed-size int64 header (op + per-array dtype/shape table) followed
# by one uint8 payload broadcast whose exact size every host derives from the
# header. Two collectives per op; arrays may be None.

_MH_DTYPES = (np.int32, np.int64, np.float32, np.uint8)
_MH_MAX_ARRAYS = 8
_MH_MAX_NDIM = 4


def _bcast_op(op: int, arrays=()) -> tuple[int, list]:
    """Host 0: broadcast (op, arrays) to all processes; followers call with
    op=0 and receive. Returns the (op, arrays) every host agreed on."""
    from jax.experimental import multihost_utils as mhu

    header = np.zeros(2 + _MH_MAX_ARRAYS * (2 + _MH_MAX_NDIM), np.int64)
    header[0] = op
    header[1] = len(arrays)
    norm = []
    for i, a in enumerate(arrays):
        base = 2 + i * (2 + _MH_MAX_NDIM)
        if a is None:
            header[base] = -1
            norm.append(None)
            continue
        a = np.ascontiguousarray(a)
        assert a.dtype.type in _MH_DTYPES, a.dtype
        assert a.ndim <= _MH_MAX_NDIM, a.shape
        header[base] = _MH_DTYPES.index(a.dtype.type)
        header[base + 1] = a.ndim
        header[base + 2: base + 2 + a.ndim] = a.shape
        norm.append(a)
    header = np.asarray(mhu.broadcast_one_to_all(header))
    op = int(header[0])
    n = int(header[1])
    metas = []
    total = 0
    for i in range(n):
        base = 2 + i * (2 + _MH_MAX_NDIM)
        d = int(header[base])
        if d < 0:
            metas.append(None)
            continue
        shape = tuple(int(s) for s in
                      header[base + 2: base + 2 + int(header[base + 1])])
        dt = np.dtype(_MH_DTYPES[d])
        metas.append((dt, shape))
        total += dt.itemsize * int(np.prod(shape, dtype=np.int64))
    payload = np.zeros(0, np.uint8)
    if total:
        if norm and any(a is not None for a in norm):
            payload = np.concatenate(
                [a.view(np.uint8).reshape(-1) for a in norm if a is not None])
            assert payload.size == total, (payload.size, total)
        else:
            payload = np.zeros(total, np.uint8)
        payload = np.asarray(mhu.broadcast_one_to_all(payload))
    out = []
    off = 0
    for meta in metas:
        if meta is None:
            out.append(None)
            continue
        dt, shape = meta
        size = dt.itemsize * int(np.prod(shape, dtype=np.int64))
        out.append(payload[off: off + size].view(dt).reshape(shape))
        off += size
    return op, out


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-environment autodetection."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(dp: int = 1, tp: int | None = None):
    """(dp, tp) mesh over all global devices (use after initialize())."""
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def is_primary() -> bool:
    """True on the host that should own HTTP + sampling (host 0)."""
    return jax.process_index() == 0


class HostLoop:
    """Host-0-drives-followers engine-call protocol: an Instance proxy.

    On host 0, engine calls that touch device state (decode, KV edits,
    clear) are broadcast (fixed-size int32 frame via multihost_utils, riding
    DCN) before executing, so every process enters the same jitted SPMD
    steps with identical global arguments and the sharded cache stays
    consistent. Followers replay the stream in `follow()`. Everything else
    (metadata, vocab, model) delegates to the wrapped Instance.

    The device-loop fast path is disabled (its fused scan isn't in the
    broadcast protocol), so Sessions built through `start_session` always
    take the step-by-step engine calls that followers can mirror.
    """

    def __init__(self, instance, max_chunk: int = 512):
        self.instance = instance
        instance.params.fast_greedy = False
        self.max_chunk = max_chunk
        self._primary = is_primary()

    def __getattr__(self, name):
        return getattr(self.instance, name)

    # -- broadcast plumbing ----------------------------------------------------

    def _bcast(self, op: int, args=(0, 0, 0), tokens=None, positions=None) -> np.ndarray:
        from jax.experimental import multihost_utils

        buf = np.zeros(5 + 2 * self.max_chunk, np.int64)
        buf[0] = op
        buf[2:5] = args
        if tokens is not None:
            n = len(tokens)
            assert n <= self.max_chunk
            buf[1] = n
            buf[5: 5 + n] = tokens
            buf[5 + self.max_chunk: 5 + self.max_chunk + n] = positions
        return np.asarray(multihost_utils.broadcast_one_to_all(buf))

    # -- host-0 Instance API ----------------------------------------------------

    def start_session(self, params=None):
        """Start a Session bound to THIS proxy (not the raw instance), so
        every engine call the session makes is broadcast to followers."""
        assert self._primary, "Sessions run on host 0 only"
        from ..runtime.session import Session

        if self.instance._session is not None:
            raise RuntimeError("Another session is currently active")
        session = Session(self, params)
        self.instance._session = session
        return session

    def decode(self, tokens: list[int], positions: np.ndarray) -> np.ndarray:
        assert self._primary
        out = None
        off = 0
        while off < len(tokens):  # respect the broadcast frame bound
            chunk = tokens[off: off + self.max_chunk]
            pos = positions[off: off + self.max_chunk]
            self._bcast(OP_DECODE, tokens=chunk, positions=pos)
            try:
                out = self.instance.decode(chunk, pos)
            except Exception:
                # failure policy: resynchronize every host to an empty cache,
                # then surface the error to the serving layer (HTTP 500)
                self.clear_cache()
                raise
            off += len(chunk)
        return out

    def clear_cache(self) -> None:
        assert self._primary
        self._bcast(OP_CLEAR)
        self.instance.clear_cache()

    def kv_seq_rm(self, p0: int, p1: int) -> None:
        assert self._primary
        self._bcast(OP_SEQ_RM, args=(p0, p1, 0))
        self.instance.kv_seq_rm(p0, p1)

    def kv_seq_add(self, p0: int, p1: int, delta: int) -> None:
        assert self._primary
        self._bcast(OP_SEQ_ADD, args=(p0, p1, delta))
        self.instance.kv_seq_add(p0, p1, delta)

    def kv_seq_div(self, p0: int, p1: int, divisor: int) -> None:
        assert self._primary
        self._bcast(OP_SEQ_DIV, args=(p0, p1, divisor))
        self.instance.kv_seq_div(p0, p1, divisor)

    def stop(self) -> None:
        assert self._primary
        self._bcast(OP_STOP)

    # -- follower loop ------------------------------------------------------------

    def follow(self) -> None:
        """Replay host 0's engine calls until OP_STOP (non-primary hosts)."""
        assert not self._primary
        inst = self.instance
        while True:
            buf = self._bcast(0)
            op = int(buf[0])
            if op == OP_STOP:
                return
            if op == OP_CLEAR:
                inst.clear_cache()
            elif op == OP_SEQ_RM:
                inst.kv_seq_rm(int(buf[2]), int(buf[3]))
            elif op == OP_SEQ_ADD:
                inst.kv_seq_add(int(buf[2]), int(buf[3]), int(buf[4]))
            elif op == OP_SEQ_DIV:
                inst.kv_seq_div(int(buf[2]), int(buf[3]), int(buf[4]))
            elif op == OP_DECODE:
                n = int(buf[1])
                tokens = buf[5: 5 + n].tolist()
                positions = buf[5 + self.max_chunk: 5 + self.max_chunk + n]
                try:
                    inst.decode(tokens, positions)
                except Exception:
                    # host 0 broadcasts OP_CLEAR after its own failure;
                    # mirror the reset locally and keep following
                    inst.clear_cache()


class SchedulerHostLoop:
    """Multi-host CONTINUOUS BATCHING: host 0 runs the full scheduler
    (admission, sampling, verification, HTTP) and broadcasts every device
    dispatch; followers replay them so the mesh-sharded cache and device
    logits evolve in lockstep (VERDICT r4 #5 — the serving driver and the
    batch scheduler unified; the reference's degenerate case is one
    serialized llama_context in one process, Server.cpp:27-36).

    The scheduler's whole device surface is its _dev_* methods
    (server/scheduler.py), each taking host-serializable args only; this
    loop installs a hook that sends (opcode, args) over DCN before host 0
    executes, and `follow()` calls the same methods on an identically
    configured (never-started) scheduler on each follower.

    Broadcasts are issued from whatever thread runs the scheduler loop on
    host 0; they are the ONLY collectives in flight during serving, so the
    follower's single-threaded replay stays ordered."""

    def __init__(self, scheduler):
        self.scheduler = scheduler
        self._primary = is_primary()
        if self._primary:
            scheduler._mh = lambda op, arrays: _bcast_op(op, arrays)

    def start(self) -> None:
        assert self._primary, "start the scheduler thread on host 0 only"
        self.scheduler.start()

    def stop(self) -> None:
        """Drain + stop the scheduler on host 0, then release followers."""
        assert self._primary
        from ..server.scheduler import OP_S_STOP

        self.scheduler.stop()
        _bcast_op(OP_S_STOP)

    def follow(self) -> None:
        """Replay host 0's scheduler dispatches until OP_S_STOP."""
        assert not self._primary
        from ..server import scheduler as sch

        s = self.scheduler
        assert s._thread is None, "follower schedulers must not be started"
        while True:
            op, args = _bcast_op(0)
            if op == sch.OP_S_STOP:
                return
            if op == sch.OP_S_STEP:
                toks, pos, sl, li, table, capture, pull = args
                s._dev_step(toks, pos, sl, li, table=table,
                            capture=[int(b) for b in capture],
                            pull=bool(pull[0]))
            elif op == sch.OP_S_PULL:
                s._dev_pull()
            elif op == sch.OP_S_SYNC:
                rows, host_logits = args
                s._dev_sync([int(b) for b in rows], host_logits)
            elif op == sch.OP_S_HORIZON:
                start_pos, forced, cids, h, table = args
                s._dev_horizon(start_pos, forced, cids, int(h[0]),
                               table=table)
            elif op == sch.OP_S_RELEASE:
                row, pages, table = args
                s._dev_release(int(row[0]),
                               pages=None if pages is None else pages,
                               table=table)
            else:
                raise RuntimeError(f"unknown scheduler opcode {op}")
