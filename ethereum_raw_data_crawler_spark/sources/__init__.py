"""Sources & sinks (SURVEY.md §2.1): the synthetic web corpus generator,
the snapshot table store (Iceberg-style atomic commits over Parquet), and
the batch fetch operator."""
