from ugfraud_ray.sources.pages import (
    PagesSpec,
    build_pages_table,
    pages_from_edge_urls,
    synthesize_pages,
    write_pages_parquet,
)
