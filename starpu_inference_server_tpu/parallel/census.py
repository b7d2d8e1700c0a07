"""Collective census: classify a compiled program's collectives by the
MESH AXES their communication groups span.

Why this exists (VERDICT r4 item 6): on the v5e-16 deployment target
the mesh factorizes as ``data`` over DCN (hosts) x ``model`` over ICI
(chips within a host). Whether a given collective rides the fast ICI or
the slow DCN is decided by which mesh axis its replica group spans —
that is compile-time information, readable from the partitioned HLO.
This module turns the HLO text + the mesh into a census like::

    {"all-reduce": {"model": 36}, "collective-permute": {"data": 42}}

so a sharding layout can be audited for "collectives ride ICI, not
DCN" without multi-host hardware (the same evidence
scripts/scaling_bench.py --decode records per mesh size).

The reference has no distributed backend (StarPU built --disable-mpi,
reference docs/installation.md:107); this is the TPU-native scaling
design's audit tool.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\("
)
_GROUPS_RE = re.compile(r"replica_groups=(\{\{[^}]*(?:\},\{[^}]*)*\}\}|"
                        r"\[[0-9,]+\]<=\[[0-9,]+\](?:T\([0-9,]+\))?)")
_PAIRS_RE = re.compile(r"source_target_pairs=\{((?:\{\d+,\d+\},?)+)\}")


def _device_coords(mesh):
    """HLO logical device number -> mesh coordinate tuple, plus the
    axis names.

    Partitioned-HLO collectives number devices by their position in the
    executable's device assignment — the mesh's flattened device order —
    NOT by platform ``device.id`` (a two-process CPU mesh has platform
    ids [0, 1, 2048, 2049] while its HLO pairs read {{0,2},{2,0},...})."""
    arr = np.asarray(mesh.devices, dtype=object)
    coords = {}
    for logical, idx in enumerate(np.ndindex(arr.shape)):
        coords[logical] = idx
    return coords, tuple(mesh.axis_names)


def _axes_label(ids, coords, axis_names) -> str:
    spanned = []
    for dim, name in enumerate(axis_names):
        if len({coords[d][dim] for d in ids if d in coords}) > 1:
            spanned.append(name)
    return "+".join(spanned) if spanned else "self"


def _parse_groups(text: str) -> list:
    """Parse a replica_groups attribute value into a list of id lists.

    Handles the explicit form ``{{0,1},{2,3}}`` and the iota form
    ``[G,S]<=[a,b,...]T(perm)`` (v2 format: the device list is
    transpose(reshape(arange(prod), rhs_dims), perm).flatten(),
    chunked into G groups of S)."""
    if text.startswith("{{"):
        return [
            [int(x) for x in grp.split(",") if x]
            for grp in re.findall(r"\{([0-9,]+)\}", text)
        ]
    m = re.match(r"\[([0-9,]+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?", text)
    if not m:
        return []
    g, s = (int(x) for x in m.group(1).split(","))
    rhs = [int(x) for x in m.group(2).split(",")]
    devices = np.arange(int(np.prod(rhs))).reshape(rhs)
    if m.group(3):
        perm = [int(x) for x in m.group(3).split(",")]
        devices = devices.transpose(perm)
    flat = devices.reshape(-1)
    return [flat[i * s:(i + 1) * s].tolist() for i in range(g)]


def collectives_by_axis(hlo_text: str, mesh) -> Dict[str, Dict[str, int]]:
    """Census of collective ops by (op kind -> spanned mesh axes ->
    count). ``collective-permute`` classifies its source->target pairs;
    group-based ops classify their replica groups. Counts are per HLO
    instruction (a program whose every group spans only 'model' shows
    no 'data' entries — nothing would cross DCN on the two-tier
    deployment)."""
    coords, axis_names = _device_coords(mesh)
    census: Dict[str, Dict[str, int]] = {}
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        op = m.group(1)
        labels = set()
        pm = _PAIRS_RE.search(line)
        if pm and op == "collective-permute":
            for a, b in re.findall(r"\{(\d+),(\d+)\}", pm.group(1)):
                labels.add(_axes_label([int(a), int(b)], coords, axis_names))
        else:
            gm = _GROUPS_RE.search(line)
            if gm:
                for group in _parse_groups(gm.group(1)):
                    labels.add(_axes_label(group, coords, axis_names))
        if not labels:
            labels = {"unknown"}
        bucket = census.setdefault(op, {})
        for label in labels:
            bucket[label] = bucket.get(label, 0) + 1
    return census
