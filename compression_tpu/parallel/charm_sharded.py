"""Multi-chip CHARM decode: image-parallel over a device mesh.

The CHARM slice chain is serial *within* one image — slice i+1's (mu, sigma)
consume slice i's decoded values (SURVEY.md §3.3; reference
models/ms2020.py ≈480 runs it one image, one device). Across images it is
embarrassingly parallel, and that is the axis this module scales: the image
batch is sharded over the mesh's data axis, so at every slice step each
device computes the slice-parameter / LRP transforms for ITS image shard as
one SPMD program, while the host range-decoder fans one thread per stream
across the WHOLE batch. The device<->host round-trip count stays 10 per
batch (not per image, and not per device — the gather/scatter at the coder
boundary moves all shards at once).

Design notes (TPU-first):

* The per-slice compiled functions are the ms2020.Codec jit OBJECTS, called
  with mesh-replicated params and batch-sharded activations. XLA's sharding
  propagation keeps the batch axis sharded through the convs (no cross-image
  math exists in the slice nets), so no shard_map or manual collectives are
  needed — the mesh program is the single-device program partitioned on the
  batch dim. Encode/decode cannot diverge: both sides run the same function
  objects (see ms2020.Codec bit-exactness notes).
* The host coder boundary is the only resharding point: CDF rows gather to
  the host (uint8 rows, batched device_get), decoded int32 values scatter
  back sharded. On a real v5e board these are ICI/PCIe transfers per shard;
  on the CPU test mesh they are memcpys.
* Batches that don't divide the mesh are padded by repeating the last blob;
  padded outputs are dropped before returning.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardedCharmCodec"]


class ShardedCharmCodec:
    """Image-parallel ms2020 decode across a ``Mesh`` (BASELINE config #4,
    the "across chips" half). Wraps a single-device ``ms2020.Codec`` —
    tables, jits and bitstream layout are shared with it."""

    def __init__(self, model, params, mesh: Mesh, axis: str = "data"):
        from compression_tpu.models import ms2020

        self.codec = ms2020.make_codec(model, params)
        self.cfg = self.codec.cfg
        self.mesh = mesh
        self.axis = axis
        self._ndev = mesh.devices.size
        # Params replicated over every mesh device (they are a few MB; DP
        # is the right parallelism for these models — SURVEY.md §2.4).
        self._p = jax.device_put(params, NamedSharding(mesh, P()))

    def _shard(self, arr):
        """Places a host/tracer array batch-sharded over the mesh."""
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(self.mesh, P(self.axis))
        )

    def decompress_batch(self, blobs: List[bytes]) -> np.ndarray:
        """Lockstep slice-batched decode of same-size blobs, image-sharded
        across the mesh. Host- and device-coded (rANS) blob formats are
        auto-detected, matching ``Codec.decompress_batch``. Output matches
        the single-device path exactly (asserted byte-for-byte in
        tests/test_charm_sharded.py)."""
        cfg = self.cfg
        codec = self.codec
        n = len(blobs)
        if n == 0:
            raise ValueError("decompress_batch needs at least one blob")
        pad = (-n) % self._ndev
        blobs = list(blobs) + [blobs[-1]] * pad
        if codec._is_device_coded(blobs[0]):
            return self._decompress_batch_rans(blobs)[:n]
        slice_strings, z_strings, xshape, zshape = codec._parse_blobs(blobs)
        m = len(blobs)

        # z decode is host-side (factorized tables); shard its output.
        z_hat = self._shard(
            jax.device_get(
                codec.side_em.decompress(
                    z_strings, tuple(int(v) for v in zshape)
                )
            )
        )
        mu_sup, sigma_sup = codec._jit_supports(self._p, z_hat)

        decoded: List = []
        for i in range(cfg.num_slices):
            mu, sigma = codec._jit_slice_params(
                i, self._p, mu_sup, sigma_sup, decoded
            )
            # Coder boundary: rows gather (uint8) -> host threads decode all
            # m streams -> int32 values scatter back sharded.
            rows = np.asarray(jax.device_get(codec.em.rows(sigma)))
            values = codec.em.decode_symbols(
                slice_strings[i], rows.reshape(m, -1)
            )
            y_hat_i = codec._apply_loc(
                self._shard(codec._slim(values.reshape(mu.shape))), mu
            )
            decoded.append(
                codec._jit_finish_slice(i, self._p, mu_sup, decoded, y_hat_i)
            )

        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = codec._jit_synthesize(self._p, y_hat)
        from compression_tpu.util import image as image_util

        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
        out = np.asarray(jax.device_get(x_hat), np.uint8)
        return out[:n]

    def _decompress_batch_rans(self, blobs: List[bytes]) -> np.ndarray:
        """Device-coded (on-TPU rANS) variant: the per-slice decode runs
        entirely on the mesh — word streams and CDF rows are batch-sharded
        and the K-lane rANS scan partitions on the batch axis like every
        other slice op, so NO values cross the host boundary at all (the
        host only feeds compressed words in and fetches pixels out)."""
        from compression_tpu.models.device_coding import pad_words

        cfg = self.cfg
        codec = self.codec
        m = len(blobs)
        slice_words, z_strings, xshape, zshape, K = codec._parse_device_blobs(
            blobs
        )
        z_hat = self._shard(
            jax.device_get(
                codec.side_em.decompress(
                    z_strings, tuple(int(v) for v in zshape)
                )
            )
        )
        mu_sup, sigma_sup = codec._jit_supports(self._p, z_hat)

        decoded: List = []
        ok_flags = []
        for i in range(cfg.num_slices):
            mu, sigma = codec._jit_slice_params(
                i, self._p, mu_sup, sigma_sup, decoded
            )
            N = int(np.prod(mu.shape[1:]))
            _enc, dec, _K, _cap = codec._rans(N, K)
            rows32 = codec.em.rows(sigma).astype(jnp.int32)
            values, ok = dec(
                self._shard(pad_words(slice_words[i])),
                rows32.reshape(m, -1),
            )
            ok_flags.append(ok)
            y_hat_i = codec._apply_loc(values.reshape(mu.shape), mu)
            decoded.append(
                codec._jit_finish_slice(i, self._p, mu_sup, decoded, y_hat_i)
            )

        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = codec._jit_synthesize(self._p, y_hat)
        from compression_tpu.util import image as image_util

        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
        x_hat, ok_flags = jax.device_get((x_hat, ok_flags))
        if not bool(np.all(np.asarray(ok_flags))):
            raise ValueError("corrupt device-coded bitstream (rANS state)")
        return np.asarray(x_hat, np.uint8)

    def decompress(self, data: bytes) -> np.ndarray:
        return self.decompress_batch([data])[0]
