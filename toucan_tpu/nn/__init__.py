from toucan_tpu.nn.norms import ConditionalLayerNorm, LayerNorm
from toucan_tpu.nn.attention import RelPositionMultiHeadedAttention, MultiHeadedAttention
from toucan_tpu.nn.positional import RelPositionalEncoding, relative_position_encoding
from toucan_tpu.nn.conformer import Conformer, ConformerBlock
from toucan_tpu.nn.predictors import DurationPredictor, VariancePredictor
from toucan_tpu.nn.length_regulator import length_regulate
from toucan_tpu.nn.postnet import PostNet
from toucan_tpu.nn.masks import make_non_pad_mask, make_pad_mask
