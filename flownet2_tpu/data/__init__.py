"""Data pipeline: flow/frame IO, dataset indices, device-feeding loader."""

from .flow_io import (  # noqa: F401
    flow_to_image,
    read_flo,
    visualize_flow_file,
    write_flo,
)
from .frame_io import read_gen  # noqa: F401
from .datasets import (  # noqa: F401
    DATASETS,
    ChairsSDHom,
    ChairsSDHomTest,
    ChairsSDHomTrain,
    FlowDataset,
    FlyingChairs,
    FlyingThings,
    FlyingThingsClean,
    FlyingThingsFinal,
    ImagesFromFolder,
    MpiSintel,
    MpiSintelClean,
    MpiSintelFinal,
    StaticCenterCrop,
    StaticRandomCrop,
    get_dataset,
)
from .loader import Batch, DataLoader, ShardingPair, device_prefetch  # noqa: F401
