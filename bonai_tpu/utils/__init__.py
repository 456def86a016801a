from .torch_import import (load_pretrained_backbone,
                           import_torch_state_dict,
                           torchvision_resnet_to_params,
                           mmdet_checkpoint_to_params)

__all__ = ["load_pretrained_backbone", "import_torch_state_dict",
           "torchvision_resnet_to_params", "mmdet_checkpoint_to_params"]
