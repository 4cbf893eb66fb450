"""Vectorized output-record assembly.

The reference writes records one at a time through htslib after in-place
edits (seq/qual rewrite, NM patch, qname copy+squeeze, FR/RR append —
group.cpp:503-573, bamutil.cpp:338-366, pair.cpp:54-68). The TPU engine
instead collects lightweight per-output descriptors (`OutRead`) and builds
the entire output payload in one columnar pass: multi-slice gathers from
the input payload for unchanged sections, vectorized 4-bit seq packing and
row scatters for edited sections, byte patches for l_read_name/NM, and
appended FR/RR tag blobs.
"""

from __future__ import annotations

import numpy as np


def multi_slice_indices(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat source indices for concatenated slices src[s_i : s_i+l_i]."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    pre = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=pre[1:])
    return np.repeat(starts - pre, lengths) + np.arange(total, dtype=np.int64)


class OutRead:
    """One output record: the template record plus pending edits.

    seq/qual arrays are set for consensus outputs; passthrough records keep
    them None (raw copy). Duplex merging may lazily materialize them.
    """

    __slots__ = ("batch", "rec", "qname_rec", "_seq", "_qual", "nm_new",
                 "fr_tag", "rr_tag", "serial")

    def __init__(self, batch, rec: int, seq=None, qual=None):
        self.batch = batch
        self.rec = rec
        self.qname_rec = rec      # record whose qname this output carries
        self._seq = seq
        self._qual = qual
        self.nm_new = None
        self.fr_tag = None
        self.rr_tag = None
        self.serial = 0

    # --- fields postmerge/dedup logic needs ---
    @property
    def l_qseq(self) -> int:
        return int(self.batch.l_qseq[self.rec])

    @property
    def tid(self) -> int:
        return int(self.batch.tid[self.rec])

    @property
    def pos(self) -> int:
        return int(self.batch.pos[self.rec])

    @property
    def seq(self) -> np.ndarray:
        if self._seq is None:
            self._seq = self.batch.seq_codes(self.rec).copy()
        return self._seq

    @property
    def qual(self) -> np.ndarray:
        if self._qual is None:
            self._qual = np.asarray(self.batch.qual(self.rec)).copy()
        return self._qual

    @property
    def qname(self) -> bytes:
        return self.batch.qname(self.qname_rec)

    @qname.setter
    def qname(self, value):
        raise AttributeError("set qname_rec instead")

    def padded_l_qname(self) -> int:
        from gencore_tpu.io.bam import padded_qname_len
        return padded_qname_len(len(self.qname))


class OutputTable:
    """Sorted columnar output set; builds the BAM payload in one pass."""

    def __init__(self, batch, entries: list, nm_vals: np.ndarray,
                 nm_patch_off: np.ndarray):
        """entries: list of OutRead in emission order (each with .serial
        already set); nm_vals/nm_patch_off: per-input-record NM value and
        byte offset of the 1-byte 'C' NM value in the payload (-1 when not
        patchable)."""
        self.batch = batch
        rec = np.array([e.rec for e in entries], dtype=np.int64)
        serial = np.array([e.serial for e in entries], dtype=np.int64)
        # bamComp order (gencore.h:19-47): tid,pos,mtid,mpos,isize, then
        # insertion order standing in for the pointer tie-break
        tids = batch.tid[rec].astype(np.int64)
        sort_tid = np.where(tids >= 0, tids, 0x7FFFFFFF)
        order = np.lexsort((serial, batch.isize[rec].astype(np.int64),
                            batch.mpos[rec].astype(np.int64),
                            batch.mtid[rec].astype(np.int64),
                            batch.pos[rec].astype(np.int64), sort_tid))
        self.entries = [entries[i] for i in order]
        self.rec = rec[order]
        self.n = len(entries)
        self.nm_vals = nm_vals
        self.nm_patch_off = nm_patch_off
        self._payload = None
        self._doff = None

    # --- stats surface ---
    def stats_arrays(self):
        rec = self.rec
        b = self.batch
        nm = np.array([(e.nm_new if e.nm_new is not None else self.nm_vals[e.rec])
                       for e in self.entries], dtype=np.int64)
        return (b.tid[rec].astype(np.int64), b.pos[rec].astype(np.int64),
                b.l_qseq[rec].astype(np.int64), nm)

    # --- payload construction ---
    def build_payload(self) -> np.ndarray:
        if self._payload is not None:
            return self._payload
        if self.n == 0:
            self._doff = np.zeros(1, dtype=np.int64)
            self._payload = np.zeros(0, dtype=np.uint8)
            return self._payload
        from gencore_tpu.io import native
        if native.get_lib() is not None and self.batch.data.flags.c_contiguous:
            out = self._build_payload_native(native)
            if out is not None:
                return out
        return self._build_payload_numpy()

    def _geometry(self):
        b = self.batch
        n = self.n
        rec = self.rec
        l_qseq = b.l_qseq[rec].astype(np.int64)
        n_cigar = b.n_cigar[rec].astype(np.int64)
        seqbytes = (l_qseq + 1) >> 1
        aux_len = b.end[rec] - b.aux_off[rec]
        qrec = np.array([e.qname_rec for e in self.entries], dtype=np.int64)
        qname_len = b.l_read_name[qrec].astype(np.int64)
        has_fr = np.array([e.fr_tag is not None for e in self.entries])
        has_rr = np.array([e.rr_tag is not None for e in self.entries])
        tag_len = has_fr * 4 + has_rr * 4
        body_len = 32 + qname_len + 4 * n_cigar + seqbytes + l_qseq + aux_len + tag_len
        doff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(body_len + 4, out=doff[1:])
        return (rec, l_qseq, n_cigar, seqbytes, aux_len, qrec, qname_len,
                has_fr, has_rr, tag_len, body_len, doff)

    def _build_payload_native(self, native) -> np.ndarray:
        """Fast path: whole-body memcpy per record + targeted overwrites.
        Layout-shifting records (qname length changed) fall back per record.
        """
        b = self.batch
        n = self.n
        (rec, l_qseq, n_cigar, seqbytes, aux_len, qrec, qname_len,
         has_fr, has_rr, tag_len, body_len, doff) = self._geometry()
        src = b.data
        orig_off = b.off[rec]
        orig_body_len = b.end[rec] - orig_off
        orig_qname_len = b.l_read_name[rec].astype(np.int64)
        shifted = qname_len != orig_qname_len

        total = int(doff[-1])
        out = np.zeros(total, dtype=np.uint8)
        self._doff = doff
        body = doff[:-1] + 4

        # block_size prefixes
        bs = body_len
        for k in range(4):
            out[doff[:-1] + k] = ((bs >> (8 * k)) & 0xFF).astype(np.uint8)

        un = np.nonzero(~shifted)[0]
        native.gather_slices(src, orig_off[un], orig_body_len[un], out, body[un])

        # qname overwrite where a same-length foreign qname was copied in
        qswap = (~shifted) & (qrec != rec)
        if qswap.any():
            sel = np.nonzero(qswap)[0]
            native.gather_slices(src, b.qname_off[qrec[sel]], qname_len[sel],
                                 out, body[sel] + 32)

        # edited seq/qual overwrites
        cg_dst = body + 32 + qname_len
        seq_dst = cg_dst + 4 * n_cigar
        qual_dst = seq_dst + seqbytes
        edited = np.array([e._seq is not None for e in self.entries])
        esel = np.nonzero(edited & ~shifted)[0]
        if len(esel):
            lmax = int(l_qseq[esel].max())
            bmax = (lmax + 1) // 2
            m = np.zeros((len(esel), bmax * 2), dtype=np.uint8)
            q = np.zeros((len(esel), lmax), dtype=np.uint8)
            for row, ei in enumerate(esel):
                e = self.entries[ei]
                m[row, :len(e._seq)] = e._seq
                q[row, :len(e._qual)] = e._qual
            native.pack_seq_rows(m, l_qseq[esel], out, seq_dst[esel])
            native.gather_slices(q.reshape(-1),
                                 np.arange(len(esel), dtype=np.int64) * lmax,
                                 l_qseq[esel], out, qual_dst[esel])

        # NM byte patches
        aux_dst = qual_dst + l_qseq
        nm_new = np.array([(-1 if e.nm_new is None else e.nm_new)
                           for e in self.entries], dtype=np.int64)
        patch = (nm_new >= 0) & (self.nm_patch_off[rec] >= 0) & ~shifted
        if patch.any():
            sel = np.nonzero(patch)[0]
            delta = self.nm_patch_off[rec[sel]] - b.aux_off[rec[sel]]
            out[aux_dst[sel] + delta] = (nm_new[sel] & 0xFF).astype(np.uint8)

        # FR / RR tags
        tag_dst = aux_dst + aux_len
        self._write_tags(out, tag_dst, has_fr & ~shifted, has_rr & ~shifted)

        # rare layout-shifting records: per-record assembly
        for i in np.nonzero(shifted)[0]:
            self._assemble_one(out, int(doff[i]), int(i))

        self._payload = out
        return out

    def _write_tags(self, out, tag_dst, has_fr, has_rr):
        if has_fr.any():
            sel = np.nonzero(has_fr)[0]
            vals = np.array([self.entries[i].fr_tag for i in sel], dtype=np.int64)
            out[tag_dst[sel]] = ord("F")
            out[tag_dst[sel] + 1] = ord("R")
            out[tag_dst[sel] + 2] = ord("C")
            out[tag_dst[sel] + 3] = (vals & 0xFF).astype(np.uint8)
        if has_rr.any():
            sel = np.nonzero(has_rr)[0]
            fr_here = np.array([self.entries[i].fr_tag is not None for i in sel])
            base = tag_dst[sel] + np.where(fr_here, 4, 0)
            vals = np.array([self.entries[i].rr_tag for i in sel], dtype=np.int64)
            out[base] = ord("R")
            out[base + 1] = ord("R")
            out[base + 2] = ord("C")
            out[base + 3] = (vals & 0xFF).astype(np.uint8)

    def _assemble_one(self, out, doff_i: int, i: int):
        """Single-record assembly (layout-shifted records)."""
        import struct
        b = self.batch
        e = self.entries[i]
        rec = e.rec
        qname = b.data[b.qname_off[e.qname_rec]:
                       b.qname_off[e.qname_rec] + b.l_read_name[e.qname_rec]].tobytes()
        fixed = bytearray(b.data[b.off[rec]:b.off[rec] + 32].tobytes())
        fixed[8] = len(qname)
        cigar = b.data[b.cigar_off[rec]:b.seq_off[rec]].tobytes()
        l = int(b.l_qseq[rec])
        if e._seq is not None:
            from gencore_tpu.io.bam import pack_seq
            seqb = pack_seq(e._seq).tobytes()
            qualb = np.asarray(e._qual, dtype=np.uint8).tobytes()
        else:
            seqb = b.data[b.seq_off[rec]:b.qual_off[rec]].tobytes()
            qualb = b.data[b.qual_off[rec]:b.aux_off[rec]].tobytes()
        aux = bytearray(b.data[b.aux_off[rec]:b.end[rec]].tobytes())
        if e.nm_new is not None and self.nm_patch_off[rec] >= 0:
            aux[int(self.nm_patch_off[rec] - b.aux_off[rec])] = e.nm_new & 0xFF
        tags = b""
        if e.fr_tag is not None:
            tags += b"FRC" + bytes([e.fr_tag & 0xFF])
        if e.rr_tag is not None:
            tags += b"RRC" + bytes([e.rr_tag & 0xFF])
        bodyb = bytes(fixed) + qname + cigar + seqb + qualb + bytes(aux) + tags
        blob = struct.pack("<i", len(bodyb)) + bodyb
        out[doff_i:doff_i + len(blob)] = np.frombuffer(blob, dtype=np.uint8)

    def _build_payload_numpy(self) -> np.ndarray:
        b = self.batch
        n = self.n
        rec = self.rec
        src = b.data
        orig_off = b.off[rec]
        orig_end = b.end[rec]

        l_qseq = b.l_qseq[rec].astype(np.int64)
        n_cigar = b.n_cigar[rec].astype(np.int64)
        seqbytes = (l_qseq + 1) >> 1
        aux_off = b.aux_off[rec]
        aux_len = orig_end - aux_off

        qrec = np.array([e.qname_rec for e in self.entries], dtype=np.int64)
        qname_len = b.l_read_name[qrec].astype(np.int64)  # incl NUL
        has_fr = np.array([e.fr_tag is not None for e in self.entries])
        has_rr = np.array([e.rr_tag is not None for e in self.entries])
        tag_len = has_fr * 4 + has_rr * 4

        body_len = 32 + qname_len + 4 * n_cigar + seqbytes + l_qseq + aux_len + tag_len
        total = int((body_len + 4).sum())
        out = np.zeros(total, dtype=np.uint8)
        doff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(body_len + 4, out=doff[1:])
        self._doff = doff

        # block_size prefixes
        bs = body_len.astype(np.int64)
        for k in range(4):
            out[doff[:-1] + k] = ((bs >> (8 * k)) & 0xFF).astype(np.uint8)
        body = doff[:-1] + 4

        # fixed 32 bytes from original, then patch l_read_name (offset 8)
        fi = multi_slice_indices(orig_off, np.full(n, 32, dtype=np.int64))
        di = multi_slice_indices(body, np.full(n, 32, dtype=np.int64))
        out[di] = src[fi]
        out[body + 8] = qname_len.astype(np.uint8)

        # qname (from qname_rec, includes NUL)
        qsrc = b.qname_off[qrec]
        out[multi_slice_indices(body + 32, qname_len)] = \
            src[multi_slice_indices(qsrc, qname_len)]

        # cigar (unchanged)
        cg_dst = body + 32 + qname_len
        cg_len = 4 * n_cigar
        out[multi_slice_indices(cg_dst, cg_len)] = \
            src[multi_slice_indices(b.cigar_off[rec], cg_len)]

        # seq: packed from final codes (matrix scatter for edited rows,
        # raw copy otherwise)
        seq_dst = cg_dst + cg_len
        edited = np.array([e._seq is not None for e in self.entries])
        if (~edited).any():
            sel = np.nonzero(~edited)[0]
            out[multi_slice_indices(seq_dst[sel], seqbytes[sel])] = \
                src[multi_slice_indices(b.seq_off[rec[sel]], seqbytes[sel])]
        if edited.any():
            sel = np.nonzero(edited)[0]
            lmax = int(l_qseq[sel].max())
            bmax = (lmax + 1) // 2
            m = np.zeros((len(sel), bmax * 2), dtype=np.uint8)
            for row, ei in enumerate(sel):
                s = self.entries[ei]._seq
                m[row, :len(s)] = s
            packed = (m[:, 0::2] << 4) | m[:, 1::2]
            pi = multi_slice_indices(
                np.arange(len(sel), dtype=np.int64) * bmax, seqbytes[sel])
            out[multi_slice_indices(seq_dst[sel], seqbytes[sel])] = packed.ravel()[pi]

        # qual
        qual_dst = seq_dst + seqbytes
        if (~edited).any():
            sel = np.nonzero(~edited)[0]
            out[multi_slice_indices(qual_dst[sel], l_qseq[sel])] = \
                src[multi_slice_indices(b.qual_off[rec[sel]], l_qseq[sel])]
        if edited.any():
            sel = np.nonzero(edited)[0]
            lmax = int(l_qseq[sel].max())
            m = np.zeros((len(sel), lmax), dtype=np.uint8)
            for row, ei in enumerate(sel):
                q = self.entries[ei]._qual
                m[row, :len(q)] = q
            pi = multi_slice_indices(
                np.arange(len(sel), dtype=np.int64) * lmax, l_qseq[sel])
            out[multi_slice_indices(qual_dst[sel], l_qseq[sel])] = m.ravel()[pi]

        # aux blob (original), then NM byte patch, then appended tags
        aux_dst = qual_dst + l_qseq
        out[multi_slice_indices(aux_dst, aux_len)] = \
            src[multi_slice_indices(aux_off, aux_len)]
        nm_new = np.array([(-1 if e.nm_new is None else e.nm_new)
                           for e in self.entries], dtype=np.int64)
        patch = (nm_new >= 0) & (self.nm_patch_off[rec] >= 0)
        if patch.any():
            sel = np.nonzero(patch)[0]
            delta = self.nm_patch_off[rec[sel]] - aux_off[sel]
            out[aux_dst[sel] + delta] = (nm_new[sel] & 0xFF).astype(np.uint8)

        # FR / RR tags ('C' typed single byte — pair.cpp:54-68 quirk)
        tag_dst = aux_dst + aux_len
        if has_fr.any():
            sel = np.nonzero(has_fr)[0]
            vals = np.array([self.entries[i].fr_tag for i in sel], dtype=np.int64)
            out[tag_dst[sel]] = ord("F")
            out[tag_dst[sel] + 1] = ord("R")
            out[tag_dst[sel] + 2] = ord("C")
            out[tag_dst[sel] + 3] = (vals & 0xFF).astype(np.uint8)
        if has_rr.any():
            sel = np.nonzero(has_rr)[0]
            base = tag_dst[sel] + np.where(has_fr[sel], 4, 0)
            vals = np.array([self.entries[i].rr_tag for i in sel], dtype=np.int64)
            out[base] = ord("R")
            out[base + 1] = ord("R")
            out[base + 2] = ord("C")
            out[base + 3] = (vals & 0xFF).astype(np.uint8)

        self._payload = out
        return out

    def record_keys(self) -> np.ndarray:
        """bamComp sort keys [n, 5] for cross-shard merging."""
        b = self.batch
        rec = self.rec
        tids = b.tid[rec].astype(np.int64)
        return np.stack([
            np.where(tids >= 0, tids, 0x7FFFFFFF),
            b.pos[rec].astype(np.int64),
            b.mtid[rec].astype(np.int64),
            b.mpos[rec].astype(np.int64),
            b.isize[rec].astype(np.int64),
        ], axis=1)

    def encoded_records(self) -> list:
        """Record bodies (without block_size) in output order — test surface."""
        payload = self.build_payload()
        doff = self._doff
        out = []
        for i in range(self.n):
            out.append(payload[doff[i] + 4:doff[i + 1]].tobytes())
        return out

    def __len__(self):
        return self.n
