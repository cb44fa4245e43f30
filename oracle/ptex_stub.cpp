// Stub for src/textures/ptex.cpp: the reference checkout ships an EMPTY
// src/ext/ptex submodule, so Ptexture.h does not exist. The oracle build
// replaces ptex.cpp with this stub — ptex textures error out (none of the
// shipped scenes use them), everything else builds unmodified.
#include "textures/ptex.h"

#include "error.h"
#include "paramset.h"

namespace pbrt {

template <typename T>
PtexTexture<T>::PtexTexture(const std::string &filename, Float gamma)
    : valid(false), filename(filename), gamma(gamma) {
    Error("ptex support not compiled into this oracle build (%s)",
          filename.c_str());
}

template <typename T>
PtexTexture<T>::~PtexTexture() {}

template <typename T>
T PtexTexture<T>::Evaluate(const SurfaceInteraction &) const {
    return T(0.f);
}

template class PtexTexture<Float>;
template class PtexTexture<Spectrum>;

PtexTexture<Float> *CreatePtexFloatTexture(const Transform &tex2world,
                                           const TextureParams &tp) {
    Float gamma = tp.FindFloat("gamma", 2.2f);
    return new PtexTexture<Float>(tp.FindFilename("filename"), gamma);
}

PtexTexture<Spectrum> *CreatePtexSpectrumTexture(const Transform &tex2world,
                                                 const TextureParams &tp) {
    Float gamma = tp.FindFloat("gamma", 2.2f);
    return new PtexTexture<Spectrum>(tp.FindFilename("filename"), gamma);
}

}  // namespace pbrt
