from bda_spadochrony_spark.ml.features import build_features, assemble_vector
from bda_spadochrony_spark.ml.regress import (make_regressor, train_regressor,
                                              evaluate_mae, save_model, load_model)

__all__ = ["build_features", "assemble_vector", "make_regressor",
           "train_regressor", "evaluate_mae", "save_model", "load_model"]
