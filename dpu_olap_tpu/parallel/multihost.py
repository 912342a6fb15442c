"""Multi-host meshes and the hierarchical (DCN x ICI) shuffle.

Reference (SURVEY §2.7 item 5, §5.8): the UPMEM topology is a flat
set -> ranks -> dpus tree with one host; scaling beyond one host has no
reference implementation. TPU-natively, a pod slice is a 2-D mesh
(hosts x chips-per-host): the "dcn" axis crosses hosts over datacenter
network, the "ici" axis stays on-die interconnect. The shuffle becomes a
two-stage transpose so DCN carries few large per-host messages instead of
H*C small ones:

  stage 1 (ici): each chip exchanges fragments within its host so chip c
                 collects everything its host has destined for chip c of
                 ANY host;
  stage 2 (dcn): chip (h, c) exchanges those host-batched fragments across
                 hosts with its peers (h', c).

After both stages device (h, c) holds one fragment from every source device
destined for its partition — identical contract to the 1-D shuffle
(parallel/shuffle.py), so the same join consumes it.

On a single process the "hosts" axis is virtual (jax.Device.process_index
groups degenerate) — the driver validates with
--xla_force_host_platform_device_count; on a real multi-host pod, initialize
jax.distributed and the same code runs with dcn = processes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .shuffle import ShuffleResult, local_fragments

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_mesh_2d(n_hosts: int | None = None, chips_per_host: int | None = None) -> Mesh:
    """Build an (hosts, chips) mesh. With real multi-host JAX, devices group
    by process_index; single-process, the host axis is a virtual split."""
    devices = jax.devices()
    procs = sorted({d.process_index for d in devices})
    if len(procs) > 1:
        by_proc = [
            [d for d in devices if d.process_index == p] for p in procs
        ]
        h = len(by_proc)
        c = len(by_proc[0])
        assert all(len(g) == c for g in by_proc), "uneven chips per host"
        grid = np.array(by_proc)
    else:
        n = len(devices)
        h = n_hosts or 2
        assert n % h == 0, f"{n} devices not divisible into {h} hosts"
        c = chips_per_host or n // h
        grid = np.array(devices[: h * c]).reshape(h, c)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def shuffle_partitions_2d(
    keys: jnp.ndarray,
    payloads: Tuple[jnp.ndarray, ...],
    n_hosts: int,
    chips_per_host: int,
    cell_size: int,
    rounds: int = 1,
) -> ShuffleResult:
    """SPMD body (inside shard_map over (DCN_AXIS, ICI_AXIS)): hierarchical
    two-stage fragment exchange. Global partition p = (h*C + c)*rounds + r
    lives on device (h, c) as its HBM-resident round r — the same
    device-resident multi-round form as the flat shuffle (rounds > 1), so
    ShuffleResult.round_planes works identically: received row s*rounds + r
    is source-device s's fragment of MY round-r partition (source index
    s = src_host*C + src_chip, host-major — exactly the order the two-stage
    exchange produces)."""
    h, c = n_hosts, chips_per_host
    p = h * c * rounds
    ck, cp, counts, overflow = local_fragments(keys, payloads, p, cell_size)

    def two_stage(x):
        # (P, cell...) -> (H, C, R, cell...): leading = (dest host, dest
        # chip, local round) — rounds are the fastest bucket axis, so they
        # ride the exchanges untouched
        hc = x.reshape((h, c, rounds) + x.shape[1:])
        # stage 1: within host, dest-chip axis -> source-chip axis
        s1 = jax.lax.all_to_all(hc, ICI_AXIS, split_axis=1, concat_axis=1, tiled=True)
        # stage 2: across hosts, dest-host axis -> source-host axis
        s2 = jax.lax.all_to_all(s1, DCN_AXIS, split_axis=0, concat_axis=0, tiled=True)
        # leading axes now (src host, src chip, round) -> flatten host-major
        return s2.reshape((p,) + x.shape[1:])

    # One stacked two-stage exchange for key + payload planes (same packing
    # as the flat shuffle: per-plane collectives paid one DCN/ICI latency per
    # payload column); the tiny counts vector exchanges separately.
    stacked = two_stage(jnp.stack([ck, *cp], axis=1))  # (P, planes, cell)
    recv_counts = two_stage(counts[:, None])[:, 0]
    return ShuffleResult(
        keys=stacked[:, 0],
        payloads=tuple(stacked[:, 1 + i] for i in range(len(cp))),
        counts=recv_counts,
        overflow=overflow.reshape(1),
        rounds=rounds,
    )


def dist_join_2d_spmd(
    left_fk, left_payloads, right_pk, right_payloads,
    n_hosts: int, chips_per_host: int, cell_left: int, cell_right: int,
    rounds: int = 1,
):
    """Full multi-host join body: hierarchical co-shuffle + fused local join
    (rounds > 1: the device-resident multi-round scan, see
    dist_join.join_shuffled)."""
    from .dist_join import join_shuffled

    right = shuffle_partitions_2d(
        right_pk, right_payloads, n_hosts, chips_per_host, cell_right,
        rounds=rounds,
    )
    left = shuffle_partitions_2d(
        left_fk, left_payloads, n_hosts, chips_per_host, cell_left,
        rounds=rounds,
    )
    return join_shuffled(left, right)


def dist_join_2d(
    mesh: Mesh,
    left_fk, left_payloads: Tuple, right_pk, right_payloads: Tuple,
    cell_left: int | None = None, cell_right: int | None = None,
    slack: float | None = None, rounds: int = 1,
):
    """Run the multi-host distributed join for arrays sharded over both mesh
    axes (row-major device order)."""
    from ..config import FLAGS
    from .shuffle import default_cell_size

    h, c = mesh.shape[DCN_AXIS], mesh.shape[ICI_AXIS]
    n_dev = h * c
    slack = slack or FLAGS.shuffle_slack
    cell_left = cell_left or default_cell_size(
        left_fk.shape[0] // n_dev, n_dev * rounds, slack
    )
    cell_right = cell_right or default_cell_size(
        right_pk.shape[0] // n_dev, n_dev * rounds, slack
    )

    spec = P((DCN_AXIS, ICI_AXIS))

    def body(lf, lps, rk, rps):
        return dist_join_2d_spmd(
            lf, lps, rk, rps, h, c, cell_left, cell_right, rounds=rounds
        )

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec, spec, spec, spec),
            check_vma=False,  # Pallas outputs can't carry vma annotations
        )
    )
    sharding = NamedSharding(mesh, spec)
    put = lambda a: jax.device_put(a, sharding)
    return fn(
        put(left_fk),
        tuple(put(a) for a in left_payloads),
        put(right_pk),
        tuple(put(a) for a in right_payloads),
    )
