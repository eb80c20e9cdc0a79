"""Device mesh construction and sharding-rule helpers."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. Sizes of -1 are inferred from the device count."""

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    expert: int = 1

    def axis_sizes(self, n_devices: int) -> dict[str, int]:
        sizes = {"data": self.data, "fsdp": self.fsdp, "tensor": self.tensor, "expert": self.expert}
        known = int(np.prod([s for s in sizes.values() if s > 0]))
        for name, s in sizes.items():
            if s <= 0:
                assert n_devices % known == 0, (n_devices, sizes)
                sizes[name] = n_devices // known
        assert int(np.prod(list(sizes.values()))) == n_devices, (sizes, n_devices)
        return sizes


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a Mesh with axes (data, fsdp, tensor, expert).

    Axis order puts ``tensor`` innermost so tensor-parallel collectives ride
    the fastest ICI links; ``data`` outermost so multi-slice DCN traffic is
    only gradient all-reduce.
    """
    devices = devices if devices is not None else jax.devices()
    spec = spec or MeshSpec()
    sizes = spec.axis_sizes(len(devices))
    arr = np.asarray(devices).reshape(
        sizes["data"], sizes["fsdp"], sizes["expert"], sizes["tensor"]
    )
    return Mesh(arr, ("data", "fsdp", "expert", "tensor"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, extra_dims: int = 0) -> NamedSharding:
    """Shard the leading batch dim over (data, fsdp) — fsdp devices also
    consume distinct microbatches, like ZeRO data parallelism."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * extra_dims)))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading dim sharded over (data, fsdp)."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"))))
    return jax.tree.map(put, batch)


def _fsdp_spec_for(shape: tuple[int, ...], fsdp_size: int, min_size: int) -> P:
    """Shard the largest divisible dim over 'fsdp'; replicate small tensors."""
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest axis that divides evenly
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def fsdp_sharding_for_tree(tree, mesh: Mesh, min_size: int = 2**14):
    """ZeRO-3 analogue: per-leaf NamedSharding sharding the largest evenly
    divisible axis over 'fsdp'. Tensors smaller than ``min_size`` elements
    stay replicated (collective overhead beats memory win)."""
    fsdp_size = mesh.shape["fsdp"]

    def leaf_sharding(x):
        shape = tuple(np.shape(x))
        return NamedSharding(mesh, _fsdp_spec_for(shape, fsdp_size, min_size))

    return jax.tree.map(leaf_sharding, tree)
