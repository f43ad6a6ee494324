"""MSI_SR_model sub-framework (TPU-native): the five classical/GAN/
transformer SR baselines of the reference (SwinIR, HSENet, TransENet,
NDSRGAN, HAT) behind one shared supervised trainer
(reference: FastDiffSR/MSI_SR_model/)."""
