"""SPMD element-axis sharding over a device mesh.

This is the framework's "communication backend" (the reference has none
— its only MPI symbol is ``MPI.COMM_SELF``, topo.py:26; see SURVEY.md
§2.13/§5).  The scaling axis of an FEM workload is the *element* axis:

* ``conn``/``Xe``/``Ke`` are sharded contiguously over a 1D ``Mesh``
  axis ``"elems"`` (padded to a multiple of the device count with
  zero-stiffness ghost elements wired to dof 0);
* dof vectors stay replicated; the matrix-free SpMV does a local
  gather -> element matvec -> ``segment_sum`` and one ``psum`` over the
  element axis to reduce contributions at shared nodes — XLA lowers the
  psum to ICI all-reduce on real hardware;
* assemble + CG run as one ``jit`` program around the shard_mapped
  kernels (replicated vector algebra, sharded element work).

No hand-written communication: collectives are emitted by XLA from
``shard_map`` + ``psum``, per the standard JAX SPMD recipe.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.precision import einsum
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import geometry, stiffness
from ..models.base import ramp

__all__ = ["make_mesh", "pad_elements", "ShardedPoisson", "ShardedElasticity"]


def make_mesh(n_devices=None, axis="elems") -> Mesh:
    """1D device mesh over the element axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def pad_elements(arr, n_shards, pad_value=0):
    """Pad the leading (element) axis to a multiple of ``n_shards``."""
    arr = np.asarray(arr)
    rem = (-arr.shape[0]) % n_shards
    if rem == 0:
        return arr
    pad = np.full((rem,) + arr.shape[1:], pad_value, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class _ShardedModel:
    """Shard mesh arrays over devices; expose a fully-jitted assemble+solve."""

    def __init__(self, mesh: Mesh, X, conn, fixed_mask, ndof_per_node, etype,
                 dtype=jnp.float64):
        self.mesh = mesh
        self.axis = ax = mesh.axis_names[0]
        n = mesh.devices.size
        self.ndof_per_node = ndof_per_node
        self.nnodes = np.asarray(X).shape[0]
        self.ndof = self.nnodes * ndof_per_node
        self.etype = etype
        self.dtype = dtype

        conn = np.asarray(conn, dtype=np.int32)
        self.nelems = conn.shape[0]
        conn_p = pad_elements(conn, n, pad_value=0)
        emask = pad_elements(
            np.ones((self.nelems, 1), dtype=np.dtype(dtype)), n, pad_value=0.0
        )

        eshard = NamedSharding(mesh, P(ax))
        rep = NamedSharding(mesh, P())

        if ndof_per_node == 1:
            conn_dof = conn_p
        else:
            nn = conn_p.shape[1]
            conn_dof = np.empty((conn_p.shape[0], nn * ndof_per_node), np.int32)
            for a in range(ndof_per_node):
                conn_dof[:, a::ndof_per_node] = ndof_per_node * conn_p + a

        self.conn = jax.device_put(conn_p, eshard)
        self.conn_dof = jax.device_put(conn_dof, eshard)
        self.emask = jax.device_put(emask, eshard)
        Xe = np.asarray(X).astype(np.dtype(dtype))[conn_p]
        self.Xe = jax.device_put(Xe, eshard)
        self.mask = jax.device_put(np.asarray(fixed_mask), rep)

        self.N = jnp.asarray(etype.shape_vals, dtype)
        self.dN = jnp.asarray(etype.shape_grads, dtype)
        self.wq = jnp.asarray(etype.quad_wts, dtype)

        espec, rspec = P(ax), P()

        def local_matvec(Ke, conn_dof, mask, u):
            uz = jnp.where(mask, 0.0, u)
            ue = jnp.take(uz, conn_dof, axis=0)
            fe = einsum("eij,ej->ei", Ke, ue)
            y = jax.ops.segment_sum(
                fe.reshape(-1), conn_dof.reshape(-1), num_segments=u.shape[0]
            )
            y = jax.lax.psum(y, ax)
            return jnp.where(mask, u, y)

        def local_diag(Ke, conn_dof):
            d = jnp.diagonal(Ke, axis1=1, axis2=2)
            d = jax.ops.segment_sum(
                d.reshape(-1), conn_dof.reshape(-1), num_segments=self.ndof
            )
            return jax.lax.psum(d, ax)

        self._matvec = shard_map(
            local_matvec, mesh=mesh,
            in_specs=(espec, espec, rspec, rspec), out_specs=rspec,
        )
        self._diag = shard_map(
            local_diag, mesh=mesh, in_specs=(espec, espec), out_specs=rspec
        )
        self._assemble = shard_map(
            self._local_assemble, mesh=mesh,
            in_specs=(espec, espec, espec, rspec), out_specs=espec,
        )
        self._jit_step = None

    # subclasses define the per-shard element assembly
    def _local_assemble(self, Xe, conn, emask, rho):
        raise NotImplementedError

    def element_jacobian(self, rho):
        """Sharded element stiffness matrices."""
        return self._assemble(self.Xe, self.conn, self.emask, rho)

    def _step(self, rho, rhs, rtol, maxiter):
        from .. import solvers

        Ke = self._assemble(self.Xe, self.conn, self.emask, rho)
        b = jnp.where(self.mask, 0.0, rhs)
        diag = self._diag(Ke, self.conn_dof)
        inv_diag = 1.0 / jnp.where(self.mask | (diag == 0), 1.0, diag)
        matvec = lambda u: self._matvec(Ke, self.conn_dof, self.mask, u)
        x, k, _ = solvers.cg_loop(
            matvec, b, inv_diag=inv_diag, rtol=rtol, maxiter=maxiter
        )
        return x, k

    def solve(self, rho, rhs, rtol=1e-8, maxiter=None):
        """Assemble + BC + Jacobi-PCG, one jitted SPMD program.

        Returns:
            (u, iters).
        """
        if maxiter is None:
            maxiter = 10 * self.ndof
        if self._jit_step is None:
            self._jit_step = jax.jit(self._step, static_argnames=("maxiter",))
        rho = jnp.asarray(rho, self.dtype)
        rhs = jnp.asarray(rhs, self.dtype)
        return self._jit_step(rho, rhs, jnp.asarray(rtol, self.dtype), maxiter)


class ShardedPoisson(_ShardedModel):
    """Element-sharded RAMP-Poisson assemble+solve (SPMD)."""

    def __init__(self, mesh, X, conn, fixed_mask, etype, p=0.0,
                 dtype=jnp.float64):
        self.p = float(p)
        super().__init__(mesh, X, conn, fixed_mask, 1, etype, dtype)

    def _local_assemble(self, Xe, conn, emask, rho):
        rho_e = jnp.take(rho, conn, axis=0)
        rho_q = geometry.interp_to_quads(self.N, rho_e)
        Ke = stiffness.poisson_stiffness(Xe, self.dN, self.wq, ramp(rho_q, self.p))
        return Ke * emask[:, :, None]


class ShardedElasticity(_ShardedModel):
    """Element-sharded isotropic elasticity assemble+solve (SPMD)."""

    def __init__(self, mesh, X, conn, fixed_mask, etype, E=10.0, nu=0.3,
                 p=0.0, dtype=jnp.float64):
        ndims = np.asarray(X).shape[1]
        self.mu, self.lam = stiffness.lame_params(E, nu, ndims)
        self.p = float(p)
        super().__init__(mesh, X, conn, fixed_mask, ndims, etype, dtype)

    def _local_assemble(self, Xe, conn, emask, rho):
        rho_e = jnp.take(rho, conn, axis=0)
        rho_q = geometry.interp_to_quads(self.N, rho_e)
        Ke = stiffness.elasticity_stiffness(
            Xe, self.dN, self.wq, ramp(rho_q, self.p), self.mu, self.lam
        )
        return Ke * emask[:, :, None]
