"""Pallas posting-decode kernel: contiguous-segment DMA -> dense impact rows.

XLA lowers the posting read as a random-index gather (~50ns/posting on the
scoring path), but posting segments are CONTIGUOUS runs of the HBM CSR
arrays — information XLA cannot exploit. This kernel gives each query-term
slot one grid program that:

  1. zeroes its dense 64K-doc row of D[V, BLOCK_SIZE] in VMEM,
  2. double-buffer-DMAs its (docid, impact) segment from HBM in chunks,
  3. places impacts at their doc positions with a scalar store loop
     (sorted unique positions; impacts are the commit-time default-boost
     BM25F impacts, see lexindex.build_shard_lexical).

Output D feeds the same MXU scoring matmuls as the XLA path. Queries with
non-default field boosts fall back to the XLA decode (impacts must be
recomputed from per-field tfs).

Enabled with SEEKSTORM_TPU_PALLAS=1 (interpret mode on CPU backends).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schema import BLOCK_SIZE

CHUNK = 2048


def pallas_enabled() -> bool:
    return bool(os.environ.get("SEEKSTORM_TPU_PALLAS"))


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


ROWS = 8  # slots per grid program (TPU block tiling: sublane multiple of 8)


def _decode_kernel(seg_off_ref, seg_len_ref, docid_hbm, impact_hbm, out_ref,
                   docid_buf, impact_buf, sems):
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros_like(out_ref)

    def one_slot(s, _):
        v = g * ROWS + s
        off = seg_off_ref[v]
        n = seg_len_ref[v]
        nchunks = (n + CHUNK - 1) // CHUNK

        def get_dma(slot, c):
            start = off + c * CHUNK
            return (
                pltpu.make_async_copy(
                    docid_hbm.at[pl.ds(start, CHUNK)], docid_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    impact_hbm.at[pl.ds(start, CHUNK)], impact_buf.at[slot],
                    sems.at[slot, 1],
                ),
            )

        @pl.when(nchunks > 0)
        def _():
            d0, i0 = get_dma(0, 0)
            d0.start()
            i0.start()

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                d1, i1 = get_dma((c + 1) % 2, c + 1)
                d1.start()
                i1.start()

            dc, ic = get_dma(slot, c)
            dc.wait()
            ic.wait()
            valid = n - c * CHUNK

            def store_body(j, _):
                @pl.when(j < valid)
                def _():
                    d = docid_buf[slot, j].astype(jnp.int32)
                    out_ref[s, d] = impact_buf[slot, j]
                return 0

            jax.lax.fori_loop(0, CHUNK, store_body, 0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, ROWS, one_slot, 0)


@functools.partial(jax.jit, static_argnames=())
def decode_blocks_pallas(pl_docid, pl_impact, seg_off, seg_len):
    """(docid u16[P], impact f32[P], seg_off i32[V], seg_len i32[V])
    -> D f32[V, BLOCK_SIZE].

    Segments must leave CHUNK elements of slack at the end of the arrays
    (the device build pads the CSR tensors), since the last chunk DMA reads
    a full CHUNK window."""
    V = seg_off.shape[0]
    assert V % ROWS == 0, "V must be padded to a multiple of 8"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, BLOCK_SIZE), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK), jnp.uint16),
            pltpu.VMEM((2, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((V, BLOCK_SIZE), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(seg_off, seg_len, pl_docid, pl_impact)
