from .stats import fused_sum_gram, pallas_feature_stats
