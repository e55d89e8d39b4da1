"""Function library: text dedup (MinHash/SimHash/Jaccard), similarity
search (brute-force/IVF/LSH), multimodal column plumbing — all JVM-side
built-ins except the multimodal decode stubs (Pandas UDFs)."""
