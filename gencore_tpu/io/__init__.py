from gencore_tpu.io.bam import BamHeader, BamReader, BamWriter, RecordBatch
from gencore_tpu.io.fasta import FastaRef
from gencore_tpu.io.bed import BedRegions

__all__ = [
    "BamHeader", "BamReader", "BamWriter", "RecordBatch", "FastaRef", "BedRegions",
]
