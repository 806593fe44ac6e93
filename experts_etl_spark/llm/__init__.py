"""Large-scale training-data-pipeline operators (BASELINE.json north
star): deduplication, similarity search, text analysis, multimodal
column plumbing.  All built on the same declarative ops layer —
100 TB-safe: no driver-side collects, shuffle keys are content buckets
(shingle / band / SRP bucket), dims broadcast only when truly small.
"""
