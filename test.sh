# STAGE 1: test the trained VAE on the test set
#python test.py --cfg configs/config_vae_egobody.yaml

# STAGE 2
#python test.py --cfg configs/config_mld_egobody.yaml
python test.py --cfg configs/config_mld_gimo.yaml
