// Ground-truth harness: renders with the REFERENCE's own header-only core.
//
// This file is new driver code that #includes the read-only reference
// sources (-I <reference>/src) -- raytracer.hxx's intersect/hit_world/
// apply_material, camera.hxx's camera, math.hxx -- and reproduces the
// reference CPU render loop (main.cxx:185-215) sequentially (avoiding the
// R1 shared-generator data race so the output is deterministic per seed).
// The TPU renderer's statistical-parity test (tests/test_reference_parity
// .py) compares its image against this binary's output: the two use
// different RNGs, so agreement is asserted on converged means at high spp
// -- exactly the "validate allclose against the reference C++ renderer"
// requirement (BASELINE.md).
//
// Scene = the reference CPU scene (main.cxx:120-129); camera = the CPU
// camera (main.cxx:179-183) with aperture passed in (0 disables the Q2
// defocus draw's effect); integrator loop = app::color (main.cxx:52-75)
// with the bounce budget as an argument; sky parameter t = .5*y + 1
// (main.cxx:71, quirk Q6). Output: raw little-endian float32 RGB, H*W*3.
//
// Build: g++ -O2 -std=c++20 -I$REF/src reference_harness.cxx -o harness -ltbb
// Usage: harness WIDTH HEIGHT SPP MAX_DEPTH SEED APERTURE OUT.BIN

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "raytracer.hxx"
#include "camera.hxx"

namespace {

math::vec3 background_color(float t) {
    // main.cxx:47-50: mix(white, {.5,.7,1}, t), unclamped.
    return math::mix(math::vec3{1}, math::vec3{.5, .7, 1}, t);
}

math::vec3 color(raytracer::data &rt, math::ray ray, unsigned max_depth) {
    // main.cxx:52-75, with the bounce budget parameterized.
    math::vec3 attenuation{1};
    auto scattered_ray = ray;
    for (auto bounce = 0u; bounce < max_depth; ++bounce) {
        if (auto hit = raytracer::hit_world(rt.spheres, scattered_ray);
            hit) {
            if (auto scattered = raytracer::apply_material(rt, scattered_ray,
                                                           hit.value());
                scattered) {
                attenuation *= scattered->second;
                scattered_ray = scattered->first;
            } else {
                return math::vec3{0};
            }
        } else {
            return background_color(
                       .5f * scattered_ray.unit_direction().y + 1.f) *
                   attenuation;
        }
    }
    return math::vec3{0};
}

}  // namespace

int main(int argc, char **argv) {
    if (argc != 8) {
        std::fprintf(stderr,
                     "usage: %s W H SPP DEPTH SEED APERTURE OUT\n", argv[0]);
        return 2;
    }
    int const width = std::atoi(argv[1]);
    int const height = std::atoi(argv[2]);
    int const spp = std::atoi(argv[3]);
    unsigned const max_depth = std::atoi(argv[4]);
    unsigned const seed = std::atoi(argv[5]);
    float const aperture = std::atof(argv[6]);

    raytracer::data rt;
    rt.generator.seed(seed);

    // Scene: main.cxx:120-129 (CPU scene; hollow glass r = -.99).
    rt.materials.emplace_back(material::lambert{math::vec3{.1, .2, .5}});
    rt.materials.emplace_back(material::metal{math::vec3{.8, .6, .2}, 0});
    rt.materials.emplace_back(material::dielectric{math::vec3{1}, 1.5});
    rt.materials.emplace_back(material::lambert{math::vec3{.64, .8, 0}});

    rt.spheres.emplace_back(math::vec3{0, 1, 0}, 1.f, 0u);
    rt.spheres.emplace_back(math::vec3{0, -1000.125f, 0}, 1000.f, 3u);
    rt.spheres.emplace_back(math::vec3{+2, 1, 0}, 1.f, 1u);
    rt.spheres.emplace_back(math::vec3{-2, 1, 0}, 1.f, 2u);
    rt.spheres.emplace_back(math::vec3{-2, 1, 0}, -.99f, 2u);

    // Camera: main.cxx:179-183.
    auto const position = math::vec3{-4, 3.2f, 5};
    auto const lookat = math::vec3{0, 1, 0};
    auto camera = raytracer::camera{
        position, lookat, math::vec3{0, 1, 0},
        static_cast<float>(width) / static_cast<float>(height), 42.f,
        aperture, math::distance(position, lookat)};

    std::uniform_real_distribution<float> u01{0.f, 1.f};
    std::vector<float> out(static_cast<size_t>(width) * height * 3);

    for (int y = 0; y < height; ++y) {
        for (int x = 0; x < width; ++x) {
            math::vec3 acc{0};
            for (int s = 0; s < spp; ++s) {
                // main.cxx:199-200 jitter.
                auto const u = (static_cast<float>(x) + u01(rt.generator)) /
                               static_cast<float>(width);
                auto const v = (static_cast<float>(y) + u01(rt.generator)) /
                               static_cast<float>(height);
                acc += color(rt, camera.ray(u, v), max_depth);
            }
            acc /= static_cast<float>(spp);
            auto const i = (static_cast<size_t>(y) * width + x) * 3;
            out[i + 0] = acc.x;
            out[i + 1] = acc.y;
            out[i + 2] = acc.z;
        }
    }

    std::FILE *f = std::fopen(argv[7], "wb");
    if (!f) return 1;
    std::fwrite(out.data(), sizeof(float), out.size(), f);
    std::fclose(f);
    return 0;
}
