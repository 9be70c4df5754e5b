"""Reusable operator library (multimodal plumbing, plan-shape helpers).

The relational/dedup/similarity operators live as catalog queries in
``production_ready_ds_spark.queries``; modules here hold the pieces
that are operators in their own right rather than query shapes.
"""
