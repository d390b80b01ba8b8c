from .losses import kd2sd_losses, mse, sd_reconstruct_losses, se_distill_losses
from .prune import l1_keep_indices, prune_to_student
from .trainer import TrainConfig, Trainer, make_loss_fn
