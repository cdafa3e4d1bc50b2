"""Execution topology (ref: scheduler/topology.hpp:33-99).

The reference models NUMA nodes and CPUs; here a "node" is a host worker
domain and the accelerator topology is the JAX device mesh.  Fake topologies
(ref: topology.hpp:64-78 fake-NUMA) let scheduler tests simulate N nodes x M
workers on any machine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List


@dataclass
class TopologyNode:
    node_id: int
    cpu_ids: List[int] = field(default_factory=list)


class Topology:
    def __init__(self, nodes: List[TopologyNode], fake: bool = False):
        self.nodes = nodes
        self.fake = fake

    @property
    def num_cpus(self) -> int:
        return sum(len(n.cpu_ids) for n in self.nodes)

    @staticmethod
    def use_default_topology(max_num_workers: int = 0) -> "Topology":
        ncpu = os.cpu_count() or 1
        if max_num_workers:
            ncpu = min(ncpu, max_num_workers)
        return Topology([TopologyNode(0, list(range(ncpu)))])

    @staticmethod
    def use_fake_numa_topology(num_workers: int, workers_per_node: int) -> "Topology":
        """Ref: topology.hpp:64-78 — simulate multi-node scheduling."""
        nodes = []
        cpu = 0
        node_id = 0
        remaining = num_workers
        while remaining > 0:
            take = min(workers_per_node, remaining)
            nodes.append(TopologyNode(node_id, list(range(cpu, cpu + take))))
            cpu += take
            node_id += 1
            remaining -= take
        return Topology(nodes, fake=True)

    @staticmethod
    def use_non_numa_topology(num_workers: int = 0) -> "Topology":
        ncpu = num_workers or (os.cpu_count() or 1)
        return Topology([TopologyNode(0, list(range(ncpu)))])

    def __repr__(self):
        return f"Topology(nodes={len(self.nodes)}, cpus={self.num_cpus}, fake={self.fake})"
