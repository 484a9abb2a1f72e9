"""Posting-list codec: delta-encoded, bit-packed docID gaps + term freqs,
in blocks of 128 with a per-block max-tf sidecar.

Functional equivalent of tantivy's posting format (delta + bitpacked blocks of
128 with skip data carrying block max-tf — evidenced via the warmup path at
quickwit-search/src/leaf.rs:174-227); byte layout is our own (numpy-friendly),
since only *content* equivalence matters for rank-identity.

All kernels are numpy-vectorized — they run inside Arrow-batched pandas UDFs,
never per-row Python.
"""

from __future__ import annotations

import numpy as np

from quickwit_spark import BLOCK_SIZE

__all__ = [
    "bitpack",
    "bitunpack",
    "encode_postings",
    "decode_postings",
    "decode_block",
    "encode_position_blocks",
    "decode_position_block",
    "decode_positions",
]


def _width(vals: np.ndarray) -> int:
    if len(vals) == 0:
        return 0
    m = int(vals.max())
    return max(int(m).bit_length(), 1) if m > 0 else 1


def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative int64 values into ``width`` bits each (big-endian bit
    order within the stream)."""
    if width == 0 or len(vals) == 0:
        return b""
    v = np.asarray(vals, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _pack_ragged(rows: list[np.ndarray], widths: list[int]) -> list[bytes]:
    """Batched bitpack of independent row arrays: identical bytes to
    ``bitpack(row, width)`` per row. Thin wrapper over :func:`_pack_blocks`
    (rows are concatenated once so the block packer sees one global array).
    """
    k = len(rows)
    if k == 0:
        return []
    if k <= 3:
        # short posting lists (the Zipf tail: most terms) — the grouping
        # machinery costs more than it saves below a few blocks
        return [bitpack(r, w) for r, w in zip(rows, widths)]
    lens = np.fromiter((len(r) for r in rows), dtype=np.int64, count=k)
    ends = np.cumsum(lens)
    starts = ends - lens
    values = (
        np.concatenate([np.asarray(r, dtype=np.int64) for r in rows])
        if ends[-1]
        else np.zeros(0, dtype=np.int64)
    )
    return _pack_blocks(values, starts, ends, np.asarray(widths, np.int64))


def _pack_blocks(
    values: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    widths: np.ndarray,
) -> list[bytes]:
    """Per-block ``bytes`` view of :func:`_pack_blocks_flat` (compat shim for
    the codec tests / short-list path; the build kernel consumes the flat
    form directly)."""
    data, offs = _pack_blocks_flat(values, starts, ends, widths)
    buf = data.tobytes()
    return [buf[offs[i] : offs[i + 1]] for i in range(len(starts))]


def _pack_blocks_flat(
    values: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    widths: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Bitpack the slices ``values[starts[i]:ends[i]]`` (one per block), each
    at ``widths[i]`` bits — byte-identical to per-slice ``bitpack``, without
    ever materializing per-block row arrays (a split has tens of thousands
    of blocks; the python slice objects alone used to dominate the kernel).

    Returns ``(data, offsets)``: ONE contiguous uint8 buffer holding every
    block's payload back-to-back in block order, plus int64 offsets
    (len(blocks)+1) — exactly an Arrow BinaryArray's layout, so the caller
    builds the column zero-copy instead of paying a per-block ``tobytes`` +
    a list-of-bytes re-copy (those two were ~40% of the encode kernel).

    Word-level packing: 8 values of width w are EXACTLY w bytes of the
    big-endian bit stream, assembled in ceil(w/8) uint64 lanes by shift-OR —
    ~1 vector op per value at uint64 width vs the old bit-matrix expansion's
    w ops per value (and its rows x lmax x w intermediate). Trailing zero
    VALUES in a padded 8-group contribute zero BITS, which is bitpack's own
    zero padding; per-row truncation to ceil(len*w/8) bytes is unchanged."""
    k = len(starts)
    warr = np.asarray(widths, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    lens_all = (np.asarray(ends, dtype=np.int64) - starts).astype(np.int64)
    nbytes_all = (lens_all * warr + 7) // 8
    out_offs = np.concatenate([[0], np.cumsum(nbytes_all)]).astype(np.int64)
    data = np.zeros(int(out_offs[-1]), dtype=np.uint8)
    if k == 0 or not len(data):
        return data, out_offs
    for w in np.unique(warr):
        if w == 0:
            continue
        idx = np.flatnonzero(warr == w)
        # sort by length and chunk so rows*max_len stays bounded — one
        # outlier-length row must not inflate the whole group's pad matrix
        idx = idx[np.argsort(lens_all[idx], kind="stable")]
        start = 0
        budget = 4_000_000  # padded elements per chunk
        while start < len(idx):
            end = start + 1
            while (
                end < len(idx)
                and (end - start + 1) * int(lens_all[idx[end]]) <= budget
            ):
                end += 1
            sub = idx[start:end]
            lmax = int(lens_all[sub[-1]])
            if lmax == 0:
                start = end
                continue
            lens = lens_all[sub]
            lmax8 = (lmax + 7) & ~7  # pad rows to whole 8-value groups
            tot = int(lens.sum())
            cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
            # position of each value within its block, shared by the
            # source gather and the padded-matrix scatter
            pos = np.arange(tot, dtype=np.int64) - np.repeat(cum, lens)
            src = np.repeat(starts[sub], lens) + pos
            dest = np.repeat(
                np.arange(len(sub), dtype=np.int64) * lmax8, lens
            ) + pos
            mat = np.zeros(len(sub) * lmax8, dtype=np.uint64)
            mat[dest] = values[src].astype(np.uint64)
            grp = mat.reshape(-1, 8)  # row-major: a row's groups contiguous
            w_i = int(w)
            n_lanes = (w_i + 7) // 8
            lanes = np.zeros((len(grp), n_lanes), dtype=np.uint64)
            for j in range(8):
                v = grp[:, j]
                b1 = (j + 1) * w_i  # stream bit past value j (MSB-first)
                k0 = (j * w_i) // 64
                k1 = (b1 - 1) // 64
                if k0 == k1:
                    lanes[:, k0] |= v << np.uint64(64 * (k0 + 1) - b1)
                else:  # value straddles two lanes (wraparound drops the
                    # hi bits already placed in lane k0)
                    lanes[:, k0] |= v >> np.uint64(b1 - 64 * (k0 + 1))
                    lanes[:, k1] |= v << np.uint64(64 * (k1 + 1) - b1)
            # lane uint64s -> big-endian bytes; each group keeps w of them
            gbytes = lanes.byteswap().view(np.uint8)[:, :w_i]
            packed = np.ascontiguousarray(gbytes).reshape(len(sub), -1)
            # scatter each block's truncated payload into the flat buffer —
            # two vectorized gathers replace the per-block tobytes loop
            nb = nbytes_all[sub]
            bpos = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(nb)[:-1]]), nb
            )
            d_idx = np.repeat(out_offs[sub], nb) + bpos
            s_idx = np.repeat(
                np.arange(len(sub), dtype=np.int64) * packed.shape[1], nb
            ) + bpos
            data[d_idx] = packed.reshape(-1)[s_idx]
            start = end
    return data, out_offs


def bitunpack(data: bytes, n: int, width: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.int64)
    weights = (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
    return bits @ weights


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[dict]:
    """Sorted docids + tfs -> list of block dicts.

    Block layout: ``first_docid`` stored raw; remaining docids as bit-packed
    gaps (docid[i] - docid[i-1], >= 1); tfs as bit-packed (tf - 1). ``max_tf``
    is the block-max sidecar used for WAND-style pruning.
    """
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    assert len(docids) == len(tfs)
    n = len(docids)
    gaps_all = np.diff(docids)
    if n > 1 and not (gaps_all > 0).all():
        # gaps are bitpacked as unsigned — a non-ascending input (e.g. a
        # docid-rebase bug upstream) would silently corrupt the list
        raise ValueError("encode_postings requires strictly ascending docids")
    tfm1_all = tfs - 1
    bounds = [(s, min(s + block_size, n)) for s in range(0, n, block_size)]
    gap_rows = [gaps_all[s : e - 1] for s, e in bounds]
    tf_rows = [tfm1_all[s:e] for s, e in bounds]
    gws = [_width(g) for g in gap_rows]
    tws = [_width(t) for t in tf_rows]
    gap_bytes = _pack_ragged(gap_rows, gws)
    tf_bytes = _pack_ragged(tf_rows, tws)
    blocks: list[dict] = []
    for i, (s, e) in enumerate(bounds):
        blocks.append(
            {
                "first_docid": int(docids[s]),
                # last_docid makes the block's docid range [first, last]
                # visible relationally (WAND candidate-overlap joins and
                # skip-data pruning read it without decoding the payload)
                "last_docid": int(docids[e - 1]),
                "count": int(e - s),
                "max_tf": int(tfs[s:e].max()),
                "gap_bits": gws[i],
                "tf_bits": tws[i],
                "docid_gaps": gap_bytes[i],
                "tfs": tf_bytes[i],
            }
        )
    return blocks


def decode_blocks_arrays(
    widths: np.ndarray,
    nvals: np.ndarray,
    payload_data: np.ndarray,
    payload_offs: np.ndarray,
) -> np.ndarray:
    """Batched bit-unpack of MANY blocks' payloads at once — the decode twin
    of :func:`_pack_blocks_flat`, for the query-side kernels.

    ``widths``/``nvals`` are per-block (bit width, value count);
    ``payload_data`` is one uint8 buffer holding every block's payload and
    ``payload_offs[i]`` the byte offset of block i's payload in it (an Arrow
    BinaryArray's exact layout, so the kernels pass parquet buffers through
    untouched). Returns ONE int64 array with the blocks' values
    back-to-back in block order.

    Blocks sharing (width, count) — every non-final block of a posting list
    has count=128 — decode in one ``unpackbits`` + matmul over the whole
    group; a per-block python loop costs ~28 µs/block vs ~3 µs here
    (measured on a 936k-posting term, 7.3k blocks: 206 ms -> 26 ms)."""
    widths = np.asarray(widths, dtype=np.int64)
    nvals = np.asarray(nvals, dtype=np.int64)
    total = int(nvals.sum())
    out = np.zeros(total, dtype=np.int64)
    if total == 0:
        return out
    dest = np.concatenate([[0], np.cumsum(nvals)])
    key = (widths << np.int64(32)) | nvals  # collision-free for any counts
    for k in np.unique(key):
        idx = np.flatnonzero(key == k)
        w = int(widths[idx[0]])
        nv = int(nvals[idx[0]])
        if w == 0 or nv == 0:
            continue
        nb = (nv * w + 7) // 8
        src = np.repeat(payload_offs[idx], nb) + np.tile(
            np.arange(nb, dtype=np.int64), len(idx)
        )
        buf = payload_data[src].reshape(len(idx), nb)
        bits = np.unpackbits(buf, axis=1)[:, : nv * w]
        weights = 1 << np.arange(w - 1, -1, -1, dtype=np.int64)
        vals = bits.reshape(len(idx), nv, w).astype(np.int64) @ weights
        d = np.repeat(dest[idx], nv) + np.tile(
            np.arange(nv, dtype=np.int64), len(idx)
        )
        out[d] = vals.reshape(-1)
    return out


def decode_blocks_ragged(
    widths: np.ndarray,
    nvals: np.ndarray,
    payload_data: np.ndarray,
    payload_offs: np.ndarray,
) -> np.ndarray:
    """Like :func:`decode_blocks_arrays` for blocks whose value counts vary
    freely (positions payloads: count = the block's sum of tfs). One
    ``unpackbits`` over the whole buffer, then per width group a single
    bit-index gather + matmul — no per-block python even when every block
    has a distinct count."""
    widths = np.asarray(widths, dtype=np.int64)
    nvals = np.asarray(nvals, dtype=np.int64)
    total = int(nvals.sum())
    out = np.zeros(total, dtype=np.int64)
    if total == 0 or not len(payload_data):
        return out
    dest = np.concatenate([[0], np.cumsum(nvals)])
    pad = np.zeros(16, dtype=np.uint8)  # tail windows may read past the end
    data = np.concatenate([payload_data, pad]).astype(np.uint64)
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.flatnonzero((widths == w) & (nvals > 0))
        if not len(idx):
            continue
        w_i = int(w)
        nv = nvals[idx]
        tot_v = int(nv.sum())
        j = np.arange(tot_v, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nv)[:-1]]), nv
        )
        # value j of block i lives at bits [offs[i]*8 + j*w, +w): read the
        # K-byte window covering it, big-endian assemble, shift-mask — K
        # gathers per value instead of w bit-index gathers (the bit-matrix
        # variant built a tot_v x w int64 intermediate that dominated at
        # millions of occurrences)
        bit0 = np.repeat(payload_offs[idx] * 8, nv) + j * w_i
        byte0 = bit0 >> 3
        shift_in = (bit0 & 7).astype(np.uint64)
        K = (7 + w_i + 7) // 8  # max bytes any w-bit window can span
        if K <= 8:
            acc = np.zeros(tot_v, dtype=np.uint64)
            for b in range(K):
                acc = (acc << np.uint64(8)) | data[byte0 + b]
            vals = (
                acc >> (np.uint64(8 * K) - shift_in - np.uint64(w_i))
            ) & np.uint64((1 << w_i) - 1)
            vals = vals.astype(np.int64)
        else:  # w > 50: window exceeds a uint64 — per-value bit gather
            allbits = np.unpackbits(payload_data)
            bits = allbits[bit0[:, None] + np.arange(w_i, dtype=np.int64)]
            weights = 1 << np.arange(w_i - 1, -1, -1, dtype=np.int64)
            vals = bits.astype(np.int64) @ weights
        d = np.repeat(dest[idx], nv) + j
        out[d] = vals
    return out


def binary_np(barr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow BinaryArray -> (uint8 data buffer, per-entry absolute byte
    offsets) without materializing python bytes objects — the layout
    :func:`decode_blocks_arrays` / :func:`decode_blocks_ragged` consume."""
    bufs = barr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        barr.offset : barr.offset + len(barr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offs[:-1]


def decode_struct_blocks(bl, need_tf: bool):
    """Arrow StructArray of blocks -> (docids, tfs | None, per-block count).

    Gap/tf payloads decode in one width-grouped batched pass
    (:func:`decode_blocks_arrays`) straight off the parquet binary buffers;
    docids come from a single segmented cumsum over all blocks. Shared by
    the query-side decode kernels and the merge executor."""
    first = bl.field("first_docid").to_numpy().astype(np.int64)
    cnt = bl.field("count").to_numpy().astype(np.int64)
    gw = bl.field("gap_bits").to_numpy().astype(np.int64)
    gdata, goffs = binary_np(bl.field("docid_gaps"))
    gaps = decode_blocks_arrays(gw, cnt - 1, gdata, goffs)
    total = int(cnt.sum())
    vstarts = np.concatenate([[0], np.cumsum(cnt)])[:-1]
    g2 = np.empty(total, dtype=np.int64)
    mask_first = np.zeros(total, dtype=bool)
    mask_first[vstarts] = True
    g2[mask_first] = first
    g2[~mask_first] = gaps
    c = np.cumsum(g2)
    base = c[vstarts] - first  # global cumsum just before each block
    docids = c - np.repeat(base, cnt)
    tfs = None
    if need_tf:
        tw = bl.field("tf_bits").to_numpy().astype(np.int64)
        tdata, toffs = binary_np(bl.field("tfs"))
        tfs = decode_blocks_arrays(tw, cnt, tdata, toffs) + 1
    return docids, tfs, cnt


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    docids = decode_block_docids(block)
    n = int(block["count"])
    tfs = bitunpack(block["tfs"], n, int(block["tf_bits"])) + 1
    return docids, tfs


def decode_block_docids(block: dict) -> np.ndarray:
    """Docid-only decode: unpack the gap payload and never touch the tf
    payload. This is the scoring opt-out path — the reference skips tf
    decompression and fieldnorms unless ``_score`` sorting is requested
    (quickwit-search/src/collector.rs:413-421)."""
    n = int(block["count"])
    gaps = bitunpack(block["docid_gaps"], n - 1, int(block["gap_bits"]))
    docids = np.empty(n, dtype=np.int64)
    docids[0] = int(block["first_docid"])
    if n > 1:
        docids[1:] = int(block["first_docid"]) + np.cumsum(gaps)
    return docids


def decode_postings(blocks: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    if not blocks:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    parts = [decode_block(b) for b in blocks]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
    )


# ---------------------------------------------------------------------------
# positions payload (``record: position`` analog — tantivy stores positions in
# a separate .pos file so docid/tf reads never touch them; we mirror that with
# a separate ``pos_blocks`` parquet column, pruned away unless a phrase query
# asks for it)
# ---------------------------------------------------------------------------

def encode_position_blocks(
    tfs: np.ndarray, flat_positions: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[dict]:
    """Token positions -> per-block payloads parallel to ``encode_postings``.

    ``flat_positions`` holds every posting's ascending token positions
    concatenated in posting (docid) order; posting i owns ``tfs[i]`` of them.
    Per block (same 128-posting boundaries as the docid blocks) the positions
    are delta-encoded with a +1 shift on each posting's first position (all
    gaps >= 1 since positions are strictly ascending within a doc), then
    bitpacked with one shared width.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    flat_positions = np.asarray(flat_positions, dtype=np.int64)
    assert int(tfs.sum()) == len(flat_positions)
    cum = np.concatenate([[0], np.cumsum(tfs)])
    # delta-encode ONCE for the whole list (posting starts get the +1 shift),
    # then slice per block — the block boundaries fall on posting starts, so
    # each block's first gap is already in start form
    g_all = flat_positions.copy()
    g_all[1:] -= flat_positions[:-1]
    post_starts = cum[:-1][tfs > 0]
    g_all[post_starts] = flat_positions[post_starts] + 1
    rows: list[np.ndarray] = []
    metas: list[tuple[int, int]] = []  # (n_pos, width)
    for start in range(0, len(tfs), block_size):
        end = min(start + block_size, len(tfs))
        g = g_all[cum[start] : cum[end]]
        rows.append(g)
        metas.append((int(cum[end] - cum[start]), _width(g)))
    packed = _pack_ragged(rows, [w for _, w in metas])
    return [
        {"pos_bits": w, "n_pos": n_pos, "positions": b}
        for (n_pos, w), b in zip(metas, packed)
    ]


def decode_position_block(pos_block: dict, tfs: np.ndarray) -> np.ndarray:
    """One block's payload + its postings' tfs -> flat ascending positions."""
    tfs = np.asarray(tfs, dtype=np.int64)
    n = int(pos_block["n_pos"])
    g = bitunpack(pos_block["positions"], n, int(pos_block["pos_bits"]))
    if n == 0:
        return g
    cs = np.cumsum(g)
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    base = np.repeat(
        np.concatenate([[0], cs[starts[1:] - 1]]), tfs
    )
    return cs - base - 1


def decode_positions(
    blocks: list[dict], pos_blocks: list[dict]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full posting list with positions -> (docids, tfs, flat_positions)."""
    if not blocks:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    if pos_blocks is None or len(pos_blocks) != len(blocks):
        # zip would silently truncate a mismatched pair (e.g. a freq-built
        # partial concatenated into a positions split) — fail loudly
        raise ValueError(
            f"pos_blocks/blocks length mismatch: "
            f"{None if pos_blocks is None else len(pos_blocks)} vs {len(blocks)}"
        )
    docid_parts, tf_parts, pos_parts = [], [], []
    for b, pb in zip(blocks, pos_blocks):
        d, t = decode_block(b)
        docid_parts.append(d)
        tf_parts.append(t)
        pos_parts.append(decode_position_block(pb, t))
    return (
        np.concatenate(docid_parts),
        np.concatenate(tf_parts),
        np.concatenate(pos_parts),
    )
