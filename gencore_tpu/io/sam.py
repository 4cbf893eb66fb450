"""SAM text rendering (reference writes SAM when the output name ends with
"sam", gencore.cpp:170-173 via htslib's text mode)."""

from __future__ import annotations

import numpy as np

from gencore_tpu.io import bam as bamio
from gencore_tpu.utils import cigar as cig

_CIGAR_OPS = "MIDNSHP=X"


def _cigar_str(cigar: np.ndarray) -> str:
    if len(cigar) == 0:
        return "*"
    ops, lens = cig.ops_lens(cigar)
    return "".join(f"{l}{_CIGAR_OPS[o]}" for o, l in zip(ops, lens))


def _aux_str(aux: np.ndarray) -> str:
    out = []
    a = 0
    end = len(aux)
    data = aux
    while a + 3 <= end:
        tag = bytes(data[a:a + 2]).decode("latin-1")
        typ = chr(data[a + 2])
        v = a + 3
        if typ in "cC":
            val = int(np.int8(data[v])) if typ == "c" else int(data[v])
            out.append(f"{tag}:i:{val}")
            a = v + 1
        elif typ in "sS":
            raw = data[v:v + 2].tobytes()
            val = int(np.frombuffer(raw, dtype=np.int16 if typ == "s" else np.uint16)[0])
            out.append(f"{tag}:i:{val}")
            a = v + 2
        elif typ in "iI":
            raw = data[v:v + 4].tobytes()
            val = int(np.frombuffer(raw, dtype=np.int32 if typ == "i" else np.uint32)[0])
            out.append(f"{tag}:i:{val}")
            a = v + 4
        elif typ == "f":
            val = float(np.frombuffer(data[v:v + 4].tobytes(), dtype=np.float32)[0])
            out.append(f"{tag}:f:{val:g}")
            a = v + 4
        elif typ == "A":
            out.append(f"{tag}:A:{chr(data[v])}")
            a = v + 1
        elif typ in "ZH":
            j = v
            while j < end and data[j] != 0:
                j += 1
            out.append(f"{tag}:{typ}:{bytes(data[v:j]).decode('latin-1')}")
            a = j + 1
        elif typ == "B":
            sub = chr(data[v])
            cnt = int(np.frombuffer(data[v + 1:v + 5].tobytes(), dtype=np.uint32)[0])
            width = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            dtype = {"c": np.int8, "C": np.uint8, "s": np.int16, "S": np.uint16,
                     "i": np.int32, "I": np.uint32, "f": np.float32}[sub]
            vals = np.frombuffer(data[v + 5:v + 5 + cnt * width].tobytes(), dtype=dtype)
            out.append(f"{tag}:B:{sub}," + ",".join(str(x) for x in vals))
            a = v + 5 + cnt * width
        else:
            break
    return "\t".join(out)


def record_to_sam(batch_like, header: bamio.BamHeader, qname: bytes, flag: int,
                  tid: int, pos: int, mapq: int, cigar, mtid: int, mpos: int,
                  isize: int, seq_codes, qual, aux) -> str:
    rname = header.names[tid] if tid >= 0 else "*"
    if mtid < 0:
        rnext = "*"
    elif mtid == tid:
        rnext = "="
    else:
        rnext = header.names[mtid]
    seq = bamio.codes_to_seq_str(np.asarray(seq_codes)) if len(seq_codes) else "*"
    q = np.asarray(qual)
    qstr = "".join(chr(min(int(x), 93) + 33) for x in q) if len(q) else "*"
    fields = [qname.decode("latin-1"), str(flag), rname, str(pos + 1),
              str(mapq), _cigar_str(np.asarray(cigar)), rnext, str(mpos + 1),
              str(isize), seq, qstr]
    tags = _aux_str(np.asarray(aux))
    if tags:
        fields.append(tags)
    return "\t".join(fields)


def header_text(header: bamio.BamHeader) -> str:
    text = header.text.decode("latin-1")
    if not text.endswith("\n") and text:
        text += "\n"
    return text


class SamWriter:
    """Writes records (as record-body bytes) to SAM text."""

    def __init__(self, path: str, header: bamio.BamHeader):
        import sys
        self.header = header
        self._own = path != "-"
        self.f = open(path, "w") if self._own else sys.stdout
        self.f.write(header_text(header))

    def write_record(self, body: bytes):
        b = bamio.RecordBatch(np.frombuffer(body, dtype=np.uint8),
                              np.array([0, len(body)], dtype=np.int64))
        line = record_to_sam(
            b, self.header, b.qname(0), int(b.flag[0]), int(b.tid[0]),
            int(b.pos[0]), int(b.mapq[0]), b.cigar(0), int(b.mtid[0]),
            int(b.mpos[0]), int(b.isize[0]), b.seq_codes(0), b.qual(0), b.aux(0))
        self.f.write(line + "\n")

    def write_table(self, table):
        for body in table.encoded_records():
            self.write_record(body)

    def close(self):
        if self._own:
            self.f.close()
