"""Physical-layout utilities: bucketed tables for co-located joins."""
