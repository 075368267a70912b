# Submodules (spans, text, dedup, similarity, multimodal) are imported
# directly by consumers; no eager re-export so pyspark-free tooling can
# import the package namespace cheaply.
