from .loss import (SingleScaleLoss, MultiScaleLoss, combined_loss,
                   init_losses)

__all__ = ['SingleScaleLoss', 'MultiScaleLoss', 'combined_loss',
           'init_losses']
