"""Multi-host (multi-process) environment initialization.

TPU-native analog of the reference's MPI environment setup
(reference src/globaldefs/GlobalDefinitions.C:88+
``initializeEnvironment``: MPI_Init, per-rank info streams, rank-0
cdata/tdata files) and of the host-spanning communicator Epetra wraps
(TRIOS_Domain.H:11-15).

On TPU pods, JAX runs one process per host; ``jax.distributed
.initialize`` wires the processes into one single-controller program
whose mesh axes span ICI within a slice and DCN across hosts.  Layout
rule (the scaling-book recipe): the *outer* mesh axis is the
DCN-spanning one, so the 2D domain decomposition puts whole latitude
bands on each host and halo exchange crosses DCN only at band
boundaries — one (nun*l*n)-sized face per step, the cheapest possible
cross-host traffic for the 27-point stencil.

NOTE: this repository's CI has a single host (one real TPU chip plus a
virtual CPU mesh), so the multi-process path cannot be exercised on
real hardware here; the mesh/spec construction logic is unit-tested
with a mocked device list instead (tests/test_multihost.py).
"""

from __future__ import annotations

import os

import numpy as np


_initialized = False


def initialize_environment(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> int:
    """Initialize the distributed JAX runtime (idempotent).

    The analog of ``initializeEnvironment`` (GlobalDefinitions.C:88+):
    call once at executable startup, before any jax device use.  With
    no arguments and no cluster environment (SLURM / TPU pod metadata),
    this is a no-op single-process setup.  Returns the process index.
    """
    global _initialized
    import jax

    want_dist = (coordinator_address is not None
                 or num_processes is not None
                 or os.environ.get("JAX_COORDINATOR_ADDRESS")
                 or os.environ.get("SLURM_NTASKS", "1") not in ("", "1"))
    if want_dist and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    _initialized = True
    return jax.process_index()


def process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def is_primary() -> bool:
    """True on the I/O process (the reference writes cdata.txt and the
    HDF5 checkpoints from rank 0 only; info_<rank>.txt per rank)."""
    return process_index() == 0


def host_spanning_device_array(devices, py: int, px: int) -> np.ndarray:
    """Arrange ``devices`` (from every process) into a (py, px) array
    whose *rows* group by process: the y axis spans hosts (DCN), the x
    axis stays within a host (ICI).

    Pure layout logic (no jax calls) so it can be unit-tested with a
    mocked device list; ``Domain`` wraps the result in a Mesh.
    """
    devices = list(devices)
    if py * px != len(devices):
        raise ValueError(f"mesh {py}x{px} != {len(devices)} devices")
    # stable sort by (process, id): contiguous per-process blocks
    devices.sort(key=lambda d: (getattr(d, "process_index", 0),
                                getattr(d, "id", 0)))
    procs = [getattr(d, "process_index", 0) for d in devices]
    nproc = len(set(procs))
    arr = np.asarray(devices, dtype=object).reshape(py, px)
    if nproc > 1:
        # validate: no row mixes processes unless a process owns
        # multiple full rows' worth of devices
        per_proc = len(devices) // nproc
        if per_proc % px != 0 and px % per_proc != 0:
            raise ValueError(
                f"cannot span {nproc} hosts with {per_proc} devices "
                f"each over a {py}x{px} mesh without splitting a halo "
                f"row across DCN; choose px | devices-per-host")
    return arr


def decomp2d_multihost(devices, n: int, m: int) -> tuple[int, int]:
    """Pick (py, px) for a host-spanning mesh: like
    :func:`.domain.decomp2d` but constrained so each host owns whole
    latitude bands (px divides the per-host device count), keeping all
    x-periodic wraparound traffic on ICI."""
    devices = list(devices)
    nd = len(devices)
    procs = {getattr(d, "process_index", 0) for d in devices}
    nproc = len(procs)
    per_proc = nd // max(nproc, 1)
    best = None
    for py in range(1, nd + 1):
        if nd % py:
            continue
        px = nd // py
        if m % py or n % px:
            continue
        if nproc > 1 and per_proc % px != 0:
            continue     # a halo row would straddle DCN
        cost = n / px + m / py
        if best is None or cost < best[0]:
            best = (cost, py, px)
    if best is None:
        raise ValueError(
            f"cannot decompose grid {n}x{m} over {nd} devices on "
            f"{nproc} hosts")
    return best[1], best[2]
