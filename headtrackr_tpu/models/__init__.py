from .detector import detect_best, detect_objects_padded, DetectorTables, detector_tables

__all__ = ["detect_best", "detect_objects_padded", "DetectorTables", "detector_tables"]
