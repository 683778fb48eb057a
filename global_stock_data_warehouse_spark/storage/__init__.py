"""Physical-layout utilities: bucketed tables for co-located joins,
additive schema evolution, and clustered small-files compaction."""
