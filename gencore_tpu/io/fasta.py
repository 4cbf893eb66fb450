"""Reference FASTA loading.

The reference loads the entire uncompressed FASTA to RAM as 4-bit packed
contigs (src/fastareader.cpp:58-169). We load to per-contig uint8 arrays of
uppercase ASCII (unpacked — simpler gathers for the device ref-arbitration
path; hg-scale memory is fine host-side and the native core packs 2bit when
needed).

Reference-parity quirks preserved:
  * sequence characters kept: isalpha plus '-' and '*' (util.h:194-210);
  * lowercase forced to uppercase;
  * contig ID = header up to first space (fastareader.cpp:102-103);
  * --quit_after_contig stops after maxContig contigs (fastareader.cpp:164).
"""

from __future__ import annotations

import numpy as np


class FastaRef:
    def __init__(self, contigs: dict | None = None):
        # name -> np.uint8 array of ASCII bases
        self.contigs: dict = contigs or {}
        self._warned_missing = False
        self._warned_len = False

    @classmethod
    def load(cls, path: str, max_contig: int = 0) -> "FastaRef":
        contigs = {}
        name = None
        parts = []
        with open(path, "rb") as f:
            for line in f:
                line = line.rstrip(b"\r\n")
                if line.startswith(b">"):
                    if name is not None:
                        contigs[name] = _join_seq(parts)
                    # reference stops once size exceeds maxContig, i.e. it
                    # keeps maxContig+1 contigs (fastareader.cpp:164)
                    if max_contig > 0 and len(contigs) > max_contig:
                        name = None
                        break
                    header = line[1:].decode()
                    name = header.split(" ")[0]
                    parts = []
                elif name is not None:
                    parts.append(line)
            if name is not None:
                contigs[name] = _join_seq(parts)
        return cls(contigs)

    def get_contig(self, name: str):
        return self.contigs.get(name)

    def base_at(self, name: str, pos: int) -> str:
        c = self.contigs[name]
        return chr(c[pos])

    def contig_len(self, name: str) -> int:
        c = self.contigs.get(name)
        return 0 if c is None else len(c)


_VALID = np.zeros(256, dtype=bool)
for ch in range(ord("A"), ord("Z") + 1):
    _VALID[ch] = True
for ch in range(ord("a"), ord("z") + 1):
    _VALID[ch] = True
_VALID[ord("-")] = True
_VALID[ord("*")] = True
_LOWER_TO_UPPER = np.arange(256, dtype=np.uint8)
_LOWER_TO_UPPER[ord("a"):ord("z") + 1] = np.arange(ord("A"), ord("Z") + 1, dtype=np.uint8)


def _join_seq(parts: list) -> np.ndarray:
    raw = np.frombuffer(b"".join(parts), dtype=np.uint8)
    raw = raw[_VALID[raw]]
    return _LOWER_TO_UPPER[raw]
