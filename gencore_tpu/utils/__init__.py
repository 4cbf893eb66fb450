from gencore_tpu.utils.umi import get_umi_from_qname, umi_diff, is_duplex
from gencore_tpu.utils import cigar

__all__ = ["get_umi_from_qname", "umi_diff", "is_duplex", "cigar"]
