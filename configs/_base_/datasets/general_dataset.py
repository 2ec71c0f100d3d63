# Directory-of-images inference loader (reference: configs/_base_/datasets/
# general_dataset.py surface).
general_dataloader = dict(
    batch_size=1,
    num_workers=2,
    dataset=dict(
        type="ImageDataset",
        rgb_image_dir="./examples",
        dataset_name="",
        network_process_size=[384, 512],
    ),
)
