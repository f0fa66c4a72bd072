from ugfraud_ray.stages.extract import LinkTextExtractor, TextExtractor, extract_edges, extract_text
from ugfraud_ray.stages.graph_build import (
    build_graph,
    dedup_edges,
    degree_table,
    map_edges_to_vids,
    number_vertices,
    with_row_index,
)
