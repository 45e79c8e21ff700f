from .components import (
    AttentionComponent,
    AttentionReduceComponent,
    AttentionWeightComponent,
    ClassificationComponent,
    EmbeddingsComponent,
    FinalAttentionComponent,
    LoadEmbeddingComponent,
    SaveEmbeddingComponent,
    TokenEmbeddingsComponent,
    TransformDataComponent,
)
from .pipeline import Pipeline, PipelineComponent, check_req_keys

__all__ = [
    "AttentionComponent",
    "AttentionReduceComponent",
    "AttentionWeightComponent",
    "ClassificationComponent",
    "EmbeddingsComponent",
    "FinalAttentionComponent",
    "LoadEmbeddingComponent",
    "Pipeline",
    "PipelineComponent",
    "SaveEmbeddingComponent",
    "TokenEmbeddingsComponent",
    "TransformDataComponent",
    "check_req_keys",
]
