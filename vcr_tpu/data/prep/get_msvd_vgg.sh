#!/usr/bin/env sh
# Fetch the MSVD-VGG corpus inputs (reference: data/msvd_vgg/get_data.sh):
# the precomputed VGG16 fc7 frame features (~1.2 GB of CSVs) and the
# pre-split lowercase/no-punctuation caption files. Run from the corpus
# directory (data/msvd_vgg/); requires network access.
set -e

fetch() {
    if [ ! -f "$(basename "$1")" ]; then
        echo "Downloading $(basename "$1") ..."
        wget --no-check-certificate "$1"
    fi
}

echo "Downloading MSVD VGG fc7 features [~1.2GB total] ..."
fetch https://www.dropbox.com/s/20mxirwrqy1av01/yt_allframes_vgg_fc7_val.txt
fetch https://www.dropbox.com/s/n1857anlodhdkm0/yt_allframes_vgg_fc7_test.txt
fetch https://www.dropbox.com/s/p2rszmjz0o0odnx/yt_allframes_vgg_fc7_train.txt

echo "Downloading caption files ..."
fetch https://www.dropbox.com/sh/4ecwl7zdha60xqo/AAAfs3zbjpeYtzfOOeFzdPMta/sents_test_lc_nopunc.txt
fetch https://www.dropbox.com/sh/4ecwl7zdha60xqo/AACLdedalP2OIPu5KG6cg5G7a/sents_train_lc_nopunc.txt
fetch https://www.dropbox.com/sh/4ecwl7zdha60xqo/AAAU2dioWf_vRTW2Gqgnd4b5a/sents_val_lc_nopunc.txt
echo "Done. Next: python -m vcr_tpu.cli --mode extract_captions --corpus msvd_vgg"
