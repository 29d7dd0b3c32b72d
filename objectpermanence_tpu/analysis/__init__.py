"""Metrics & offline analysis: vectorized IoU/mAP with containment masks."""
