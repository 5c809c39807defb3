from .loader import (filter_kwargs, import_module, init_model,
                     load_model_class)

__all__ = ['filter_kwargs', 'import_module', 'init_model', 'load_model_class']
