"""Physical design: gold-table pipelines replacing the reference's
indexes / materialized view / denormalized fact table (SURVEY.md §4)."""
