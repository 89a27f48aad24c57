from .bounded_scan import BoundedScanResult, bounded_scan
from .fill import genesis_floors, lookup_plan

__all__ = ["BoundedScanResult", "bounded_scan", "genesis_floors", "lookup_plan"]
