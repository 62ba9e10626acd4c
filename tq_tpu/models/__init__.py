"""Model zoo: JAX-native implementations of the reference's workloads.

Families (SURVEY.md §2.2): MNIST MLP (#3), Wikitext-2 LSTM LM (#5),
ImageNet CNNs (#2: alexnet, vgg16_bn, resnet18, mobilenet_v2,
efficientnet_b0).  Each module exposes init/apply plus a ``layer_costs``
shape table for the efficiency model and a ``convert`` for TR
quantization.
"""
