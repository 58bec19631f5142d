"""Device mesh + sharding helpers.

The reference's distribution story is NCCL data-parallel DDP
(`/root/reference/code/mmcv/mmcv/parallel/distributed.py`,
`runner/dist_utils.py:13-60`).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded) and a ``model``
axis reserved for intra-image spatial sharding of very large inputs; XLA
emits all collectives (grad all-reduce rides ICI within a slice, DCN across
slices) — there is no user-level communication code anywhere in this
framework.

Multi-host bootstrap (the reference's slurm/mpi/pytorch launchers) maps to
``jax.distributed.initialize()`` — see :func:`initialize_distributed`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, PS("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PS())


def shard_batch_pytree(batch, mesh: Mesh):
    """Device-put a host batch with every leaf sharded on its leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (replaces reference ``init_dist``/launchers).

    On single-host this is a no-op; on multi-host pods JAX picks up the TPU
    runtime environment automatically when called with no args."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator is None and num_processes is None:
        return  # single-host run, nothing to bootstrap
    # Distributed args were given explicitly: a failed bootstrap must NOT
    # degrade to a silent single-host run (it would corrupt a multi-chip
    # training job) — propagate the error.
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    else:
        jax.distributed.initialize()


def is_main_process() -> bool:
    """Reference ``master_only`` decorator equivalent."""
    return jax.process_index() == 0


def _pack_results(local_results: list):
    """Pickle a per-host result list into a (payload, size) pair for the
    all-gather. Split out of :func:`collect_results` so the multi-host
    wire format is unit-testable without multiple processes."""
    import pickle

    import numpy as np

    payload = np.frombuffer(pickle.dumps(local_results), np.uint8)
    return payload, np.array([payload.size], np.int64)


def _merge_gathered(gathered, sizes) -> list:
    """Inverse of :func:`_pack_results` over stacked per-host buffers:
    ``gathered`` (P, max_len) uint8 rows padded to the longest payload,
    ``sizes`` (P, 1) true lengths. Preserves host order (the reference's
    rank-ordered `collect_results_cpu`, `code/mmdet/apis/test.py:200`)."""
    import pickle

    out = []
    for i in range(gathered.shape[0]):
        out.extend(pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes()))
    return out


def collect_results(local_results: list) -> list:
    """Gather per-host python result lists onto every host.

    Replaces the reference rank-0 tmpdir-pickle / CUDA-bytes gather
    (`code/mmdet/apis/test.py:135-207`) with an XLA all-gather of pickled
    bytes over the mesh.  Single-process: identity.
    """
    if jax.process_count() == 1:
        return list(local_results)
    import numpy as np
    from jax.experimental import multihost_utils

    payload, n = _pack_results(local_results)
    sizes = multihost_utils.process_allgather(n)
    max_len = int(sizes.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return _merge_gathered(gathered, sizes)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the image HEIGHT axis over the 'model' mesh axis (batch over
    'data'): intra-image spatial partitioning for very large inputs — the
    TPU analogue of the reference's resolution scale axis (SURVEY §5
    'long-context'). XLA GSPMD inserts the conv halo exchanges
    automatically; no user communication code."""
    return NamedSharding(mesh, PS("data", "model"))


def run_spatially_sharded(fn, mesh: Mesh, images, *args,
                          compile_only: bool = False):
    """jit ``fn`` with the batch sharded over 'data' AND the image height
    sharded over 'model'. Returns outputs with compiler-chosen shardings.

    ``compile_only``: AOT-lower+compile under the mesh without executing
    (GSPMD lowering validation on hosts where execution would trip the
    XLA:CPU collective rendezvous timeout); returns the compiled object."""
    import jax

    sharded = jax.device_put(images, spatial_sharding(mesh))
    if compile_only:
        return jax.jit(fn).lower(sharded, *args).compile()
    return jax.jit(fn)(sharded, *args)


def maybe_constrain(x, *spec):
    """``with_sharding_constraint`` iff tracing under a mesh whose axes
    cover ``spec`` (no-op single-chip / unmeshed).

    Used to make the dp x sp resharding EXPLICIT at the neck/head boundary:
    the head's flat multi-level gather mixes H into the row index, which
    GSPMD otherwise handles with involuntary full rematerialization on
    every reshape (MULTICHIP_r02 tail). One constrained all-gather of the
    (small) FPN maps replaces those."""
    mesh = None
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and m.axis_names:
            mesh = m
    except Exception:
        pass
    if mesh is None:
        try:        # legacy `with mesh:` context (train step, dryrun)
            from jax._src.mesh import thread_resources
            pm = thread_resources.env.physical_mesh
            if pm is not None and not pm.empty:
                mesh = pm
        except Exception:
            pass
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    if any(s is not None and s not in names for s in spec):
        return x
    sizes = dict(zip(mesh.axis_names, mesh.shape.values()
                     if hasattr(mesh, "shape") else mesh.axis_sizes))
    if all(sizes.get(s, 1) == 1 for s in spec if s is not None):
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    ps = PartitionSpec(*spec)
    if hasattr(mesh, "devices"):            # concrete Mesh
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, ps))
    return jax.lax.with_sharding_constraint(x, ps)
