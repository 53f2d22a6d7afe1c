"""Harden Pallas TPU interpret mode against its global-state races.

Interpret mode keeps ONE module-level SharedMemory sized to the
initializing program's device count. jax dispatch is async, so a
1-device program (e.g. a single-chip reference computation in a parity
check) can overlap an 8-device shard_map program; whichever initializes
second hits ``assert _shared_memory.num_cores == num_cores`` INSIDE an
io_callback on a device thread. The assert kills that device's program
silently and its siblings park forever at the global
``threading.Barrier``. Separately, that barrier and XLA's CPU
collectives form two INDEPENDENT rendezvous domains: XLA's concurrent
scheduler may order dataflow-independent ops differently per device,
parking some devices at the interpret barrier and others inside a
collective — a cross-domain deadlock (r5 faulthandler dump: 6 threads
at the barrier, 2 in a collective, zero CPU; benchmarks/RESULTS.md).

Two patches, applied before any trace captures the originals:

- ``_initialize_shared_memory``: on size conflict, WAIT (bounded) for
  the other program group's cleanup to clear the global instead of
  assert-crashing one device thread.
- ``_barrier``: skip the mid-program rendezvous unless race detection
  needs its clock sync — this package's interpreted kernels are
  shard-LOCAL (no cross-device DMA or semaphores; all cross-chip
  movement is XLA collectives outside Pallas), so the barrier's only
  payload here is the race-detector clock sync. The cleanup barrier
  stays: a device reaches it only after finishing every collective, so
  it cannot cross-deadlock.

Used by tests/conftest.py AND ``__graft_entry__.dryrun_multichip`` (the
driver's multichip validation runs without conftest). Idempotent.
"""

from __future__ import annotations

import time

__all__ = ["harden_interpret_mode"]

_applied = False


def harden_interpret_mode() -> None:
    global _applied
    if _applied:
        return
    from jax._src.pallas.mosaic.interpret import (
        interpret_pallas_call as _ipc,
    )

    _orig_init = _ipc._initialize_shared_memory

    def _patient_init(
        device_id, num_devices, num_cores_per_device, *, interpret_params
    ):
        nc = int(num_devices) * int(num_cores_per_device)
        deadline = time.time() + 1800
        while True:
            sm = _ipc._shared_memory
            if sm is None or sm.num_cores == nc:
                try:
                    return _orig_init(
                        device_id, num_devices, num_cores_per_device,
                        interpret_params=interpret_params,
                    )
                except AssertionError:
                    pass  # lost the init race again; wait and retry
            if time.time() > deadline:
                raise RuntimeError(
                    "interpret-mode SharedMemory size conflict "
                    f"(want {nc} cores) unresolved after 1800 s"
                )
            time.sleep(0.005)

    def _barrier_no_rendezvous(device_id):
        del device_id
        sm = _ipc._get_shared_memory()
        if sm.num_devices > 1 and sm.detect_races:
            sm.barrier.wait(timeout=1800)  # raises BrokenBarrierError

    def _cleanup_countdown(device_id):
        """Last-device-clears countdown instead of a barrier.

        The stock cleanup parks every device at an 8-party barrier at
        program end — but XLA's scheduler may order a device's cleanup
        callback before its dataflow-INDEPENDENT collectives, re-
        creating the cross-domain deadlock there. No device touches the
        shared memory after its own cleanup call, so waiting is
        unnecessary: decrement, and the last participant clears the
        global (under the module's init lock).
        """
        del device_id
        with _ipc._shared_memory_init_lock:
            sm = _ipc._shared_memory
            if sm is None:
                return
            remaining = getattr(sm, "_cleanup_remaining", sm.num_devices)
            remaining -= 1
            if remaining <= 0:
                _ipc._shared_memory = None
            else:
                sm._cleanup_remaining = remaining

    _ipc._initialize_shared_memory = _patient_init
    _ipc._barrier = _barrier_no_rendezvous
    _ipc._clean_up_shared_memory = _cleanup_countdown
    _applied = True
