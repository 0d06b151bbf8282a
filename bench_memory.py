"""Memory-parity audit: repo index bytes vs an analytic model of the
reference's index.bin for the SAME corpus (VERDICT r3 next-step #6).

The reference cannot be built here (no Rust toolchain in the image), so
its storage is modeled byte-accurately from its writers:

  * per-(term, 64K-block) posting list: 20 B key head
    (index.rs:2806, ngram off), docid storage chosen per block —
    RLE 2 + 4 B/run when runs <= min(n/2, u16::MAX) for n < 4096 or
    runs <= 2048 for n >= 4096, else u16 array (2 B/doc) below 4096,
    else 8 KB bitmap (compress_postinglist.rs:240-330, 895-945);
  * per posting: a 2 B pointer below the pivot, 3 B above — the pivot
    is where cumulative non-embedded position bytes reach 32768
    (add_result.rs:1494, index_posting.rs:585-600);
  * positions: embedded into the pointer (0 extra bytes) for short
    posting/position shapes (index_posting.rs:446-560: bit-width
    checks per posting_pointer_size and field count), otherwise
    per-field meta bytes (index_posting.rs:380-435) + stop-bit varint
    deltas (compress_positions: 1 B < 128, 2 B < 16384, else 3 B);
  * per doc: 1 B compressed length per indexed field
    (document_length_compressed_array).

Run: python bench_memory.py [docs=1000000] [index=/tmp/memix]
Prints a per-category table plus one JSON line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np


def _varint_bytes(deltas: np.ndarray) -> np.ndarray:
    return (1 + (deltas >= 128).astype(np.int64)
            + (deltas >= 16384).astype(np.int64))


def _bit_len(x: np.ndarray) -> np.ndarray:
    """u16 bit length (u16::BITS - leading_zeros)."""
    out = np.zeros(x.shape, np.int64)
    v = x.astype(np.uint32)
    for b in range(15, -1, -1):
        out = np.where((out == 0) & (v >= (1 << b)), b + 1, out)
    return out


def model_reference_level(lvl, F: int, field_id_bits: int) -> dict:
    """Analytic reference index.bin bytes for one 64K-doc level."""
    docid = np.asarray(lvl.docid).astype(np.int64)
    tf = np.asarray(lvl.tf).astype(np.int64)
    pos = np.asarray(lvl.pos).astype(np.int64)
    off = np.asarray(lvl.term_offset).astype(np.int64)
    P = len(docid)
    T = len(off) - 1
    if P == 0:
        return dict(key_head=20 * T, docids=0, pointers=0, positions=0)

    seg_id = np.repeat(np.arange(T), np.diff(off))
    # --- docid storage: runs per segment ---
    same_seg = seg_id[1:] == seg_id[:-1]
    consec = same_seg & (docid[1:] == docid[:-1] + 1)
    n_per = np.diff(off)
    runs = n_per - np.bincount(seg_id[1:][consec], minlength=T)
    small = n_per < 4096
    rle_small = small & (runs <= n_per // 2)
    rle_big = ~small & (runs <= 2048)
    docid_bytes = np.where(
        rle_small | rle_big, 4 * runs + 2,
        np.where(small, 2 * n_per, 8192)).sum()

    # --- positions: per-posting embed / meta+varint ---
    psum = tf.sum(axis=1)                       # positions per posting
    nf = (tf > 0).sum(axis=1)
    pos_off = np.zeros(P + 1, np.int64)
    np.cumsum(psum, out=pos_off[1:])

    # varint bytes of position deltas within each (posting, field) run:
    # run starts restart the delta at the absolute position
    fcum = np.zeros((P, F + 1), np.int64)
    np.cumsum(tf, axis=1, out=fcum[:, 1:])
    run_first = np.zeros(len(pos), bool)
    for f in range(F):
        starts = pos_off[:-1] + fcum[:, f]
        has = tf[:, f] > 0
        run_first[starts[has]] = True
    deltas = np.empty(len(pos), np.int64)
    deltas[0] = pos[0]
    deltas[1:] = pos[1:] - pos[:-1]
    deltas[run_first] = pos[run_first]
    vb = _varint_bytes(np.maximum(deltas, 0))
    pos_bytes_per = np.add.reduceat(vb, pos_off[:-1]) if len(pos) else \
        np.zeros(P, np.int64)
    pos_bytes_per[psum == 0] = 0

    # meta bytes (non-embedded), general multi-field branch when F > 1:
    # per nonempty field 1/2/3 B by meta_bits; F == 1: by count
    if F == 1:
        cnt = tf[:, 0]
        meta = np.where(cnt < 128, 1, np.where(cnt < 16384, 2, 3))
        meta = np.where(cnt > 0, meta, 0)
        meta_per = meta.astype(np.int64)
    else:
        meta_per = np.zeros(P, np.int64)
        first_seen = np.zeros(P, bool)
        for f in range(F):
            cnt = tf[:, f]
            has = cnt > 0
            first_bit = has & ~first_seen
            meta_bits = (first_bit.astype(np.int64)
                         + _bit_len(np.minimum(cnt, 0xFFFF))
                         + field_id_bits)
            mb = np.where(meta_bits <= 6, 1,
                          np.where(meta_bits <= 13, 2, 3))
            meta_per += np.where(has, mb, 0)
            first_seen |= has

    # embed test per posting (positions packed into the pointer).  The
    # pointer size depends on the pivot which depends on cumulative
    # non-embedded bytes — evaluate for both sizes, then walk segments.
    first_pos = np.zeros((P, 4), np.int64)
    have = np.zeros((P, 4), bool)
    for j in range(4):
        sel = psum > j
        first_pos[sel, j] = pos[np.minimum(pos_off[:-1][sel] + j,
                                           len(pos) - 1)]
        have[:, j] = sel
    bl = _bit_len(np.minimum(first_pos, 0xFFFF))

    def embed_mask(ps: int) -> np.ndarray:
        if F == 1:
            if ps == 2:
                return ((psum == 1) & (bl[:, 0] <= 14)) | \
                       ((psum == 2) & (bl[:, 0] <= 7) & (bl[:, 1] <= 7))
            return (((psum == 1) & (bl[:, 0] <= 21))
                    | ((psum == 2) & (bl[:, 0] <= 10) & (bl[:, 1] <= 11))
                    | ((psum == 3) & (bl[:, :3] <= 7).all(axis=1))
                    | ((psum == 4) & (bl[:, :3] <= 5).all(axis=1)
                       & (bl[:, 3] <= 6)))
        bits = 12 if ps == 2 else 19
        used = nf * field_id_bits
        rem = np.maximum(bits - used, 0)
        ok = used < bits
        r3 = rem // 3
        r32 = (rem - r3) // 2
        m = ((psum == 1) & (bl[:, 0] <= rem)) | \
            ((psum == 2) & (bl[:, 0] <= rem // 2)
             & (bl[:, 1] <= rem - rem // 2))
        m3 = ((psum == 3) & (bl[:, 0] <= r3) & (bl[:, 1] <= r32)
              & (bl[:, 2] <= rem - r32 - r3))
        if ps == 2:
            m3 &= nf == 1
            return ok & (m | m3)
        r4 = rem // 4
        r43 = (rem - r4) // 3
        r432 = (rem - r4 - r43) // 2
        m4 = ((psum == 4) & (nf == 1) & (bl[:, 0] <= r4)
              & (bl[:, 1] <= r43) & (bl[:, 2] <= r432)
              & (bl[:, 3] <= rem - r4 - r43 - r432))
        return ok & (m | m3 | m4)

    emb2 = embed_mask(2)
    emb3 = embed_mask(3)
    nonemb2 = np.where(emb2, 0, meta_per + pos_bytes_per)
    nonemb3 = np.where(emb3, 0, meta_per + pos_bytes_per)

    # pivot walk per segment: cheap vector path for segments whose total
    # 2B-pointer position bytes stay below 32768 (the vast majority)
    seg_tot2 = np.add.reduceat(nonemb2, off[:-1]) if P else None
    ptr_bytes = 0
    pos_bytes = 0
    easy = seg_tot2 < 32768
    ptr_bytes += int((2 * n_per[easy]).sum())
    pos_bytes += int(seg_tot2[easy].sum())
    for t in np.flatnonzero(~easy):
        a, b = int(off[t]), int(off[t + 1])
        cum = 0
        for p in range(a, b):
            if cum < 32768:
                ptr_bytes += 2
                cum += int(nonemb2[p])
                pos_bytes += int(nonemb2[p])
            else:
                ptr_bytes += 3
                pos_bytes += int(nonemb3[p])
    return dict(key_head=20 * T, docids=int(docid_bytes),
                pointers=int(ptr_bytes), positions=int(pos_bytes))


def repo_bytes(index_path: Path) -> dict:
    cats = {"postings_npy": 0, "terms": 0, "doclen": 0, "docstore": 0,
            "lexcache": 0, "facets": 0, "meta": 0, "other": 0}
    for p in index_path.rglob("*"):
        if not p.is_file():
            continue
        n = p.stat().st_size
        nm = p.name
        if nm in ("docid.npy", "tf.npy", "pos.npy", "term_offset.npy",
                  "postings.bin"):
            cats["postings_npy"] += n
        elif nm in ("term_hash.npy", "terms.txt"):
            cats["terms"] += n
        elif nm == "doclen.npy":
            cats["doclen"] += n
        elif nm in ("docs.bin", "docptr.npy"):
            cats["docstore"] += n
        elif nm.startswith("lexcache"):
            cats["lexcache"] += n
        elif nm.startswith("facet_"):
            cats["facets"] += n
        elif nm.endswith(".json") or nm.endswith(".csv"):
            cats["meta"] += n
        else:
            cats["other"] += n
    return cats


def hbm_bytes(idx) -> dict:
    """Device-resident scoring bytes by engine (analytic, host arrays)."""
    dense = wand = 0
    for sh in idx.shards:
        lex = sh.lexical
        if lex is None:
            continue
        dense += (lex.dev_docid.nbytes + lex.dev_imp.nbytes
                  + lex.bitmaps.nbytes + lex.dense_tf.nbytes
                  + lex.comp.nbytes + lex.sat1.nbytes)
    from seekstorm_tpu.ops import wand as wand_mod
    st = getattr(idx, "_wand_state", None)
    if st is not None:
        for a in (st.ppool, st.vpool, st.rpool, st.sp_prow, st.sp_ioff):
            wand += a.size * a.dtype.itemsize
        wand += st.ipool.size * st.ipool.dtype.itemsize
    return {"dense_tensors": int(dense), "wand_pools": int(wand)}


def main() -> None:
    kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    n_docs = int(kw.get("docs", 1_000_000))
    ix_path = Path(kw.get("index", "/tmp/memix"))

    import jax

    if kw.get("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import seekstorm_tpu as st

    sys.path.insert(0, str(Path(__file__).parent))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    if not (ix_path / "index.json").exists():
        rng = np.random.default_rng(11)
        t0 = time.time()
        print(f"# building {n_docs} docs at {ix_path} ...")
        docs = bench.make_corpus(n_docs, int(kw.get('vocab', 30000)), rng)
        schema = [
            st.SchemaField("title", st.FieldType.Text, stored=True,
                           indexed=True, boost=10.0),
            st.SchemaField("body", st.FieldType.Text, stored=True,
                           indexed=True),
        ]
        idx = st.create_index(ix_path, schema,
                              shard_count=int(kw.get('shards', 1)))
        idx.index_documents(docs)
        idx.commit()
        print(f"# built in {time.time()-t0:.0f}s")
    else:
        idx = st.open_index(ix_path)
        idx.ensure_loaded()

    F = len([f for f in idx.schema if f.indexed])
    fid_bits = max(1, (F - 1).bit_length())
    ref = {"key_head": 0, "docids": 0, "pointers": 0, "positions": 0}
    n_docs_total = 0
    for sh in idx.shards:
        for lvl in sh.lexical.levels:
            r = model_reference_level(lvl, F, fid_bits)
            for k, v in r.items():
                ref[k] += v
            n_docs_total += lvl.doc_count
    ref["doclen"] = n_docs_total * F
    ref_total = sum(ref.values())

    mine = repo_bytes(ix_path)
    hbm = hbm_bytes(idx)
    mine_index = (mine["postings_npy"] + mine["terms"] + mine["doclen"]
                  + mine["lexcache"])

    nd = max(n_docs_total, 1)
    print(f"\n== memory parity @ {n_docs_total} docs ==")
    print("reference index.bin model (postings side):")
    for k, v in ref.items():
        print(f"  {k:12s} {v/1e6:10.1f} MB  {v/nd:7.2f} B/doc")
    print(f"  {'TOTAL':12s} {ref_total/1e6:10.1f} MB  "
          f"{ref_total/nd:7.2f} B/doc")
    print("repo on-disk:")
    for k, v in mine.items():
        print(f"  {k:12s} {v/1e6:10.1f} MB  {v/nd:7.2f} B/doc")
    print(f"  {'INDEX(cmp)':12s} {mine_index/1e6:10.1f} MB  "
          f"{mine_index/nd:7.2f} B/doc   (postings+terms+doclen+lexcache)")
    print("repo HBM serving tensors:")
    for k, v in hbm.items():
        print(f"  {k:12s} {v/1e6:10.1f} MB  {v/nd:7.2f} B/doc")
    ratio = mine_index / max(ref_total, 1)
    print(f"\nindex-bytes ratio repo/reference = {ratio:.2f}x")
    print(json.dumps({
        "metric": "index_bytes_per_doc", "value": round(mine_index / nd, 2),
        "unit": "B/doc", "vs_baseline": round(ratio, 3),
        "ref_model_B_per_doc": round(ref_total / nd, 2),
        "hbm_B_per_doc": round(sum(hbm.values()) / nd, 2),
        "docs": n_docs_total,
    }))


if __name__ == "__main__":
    main()
