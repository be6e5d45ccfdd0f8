// Reference parity + baseline harness.
//
// Compiles AGAINST the upstream header-only reference library (include path
// supplied by the build command, see tests/ref_harness.py) and renders a
// scene dumped by visionaray_tpu so the pytest suite can assert pixel
// parity against the REAL reference instead of the hand-written numpy
// oracle, and pin bench.py's vs_baseline to the reference's own CPU
// renderer on this machine.
//
// This file is original harness code (shaped like the five-object API of
// the reference's minimal example: camera, render target, scheduler,
// params, kernel); it contains no code copied from the reference.
//
// Modes:
//   ref_harness parity  <scene.txt> <out.raw> <algo> <w> <h> <bounces>
//       scalar simple_sched render, raw f32 RGBA dump (row 0 = bottom)
//   ref_harness bench   <scene.txt> <w> <h> <bounces> <frames>
//       tiled_sched (all cores) + SIMD packets + pathtracing kernel,
//       prints one JSON line with Mrays/s
//
// Scene text format (one directive per line):
//   camera ex ey ez  cx cy cz  ux uy uz  fovy_rad
//   bg r g b a
//   ambient r g b a
//   light px py pz  clr clg clb  kl  att_c att_l att_q
//   mat <emissive|matte|mirror|plastic> ca3 ka cd3 kd cs3 ks exp cr3 kr
//       ior3 abs3 ce3 ls                       (all 29 numbers, per type)
//   tri v1xyz e1xyz e2xyz geom_id
//   sphere cx cy cz r geom_id

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <visionaray/bvh.h>
#include <visionaray/camera.h>
#include <visionaray/generic_material.h>
#include <visionaray/generic_primitive.h>
#include <visionaray/kernels.h>
#include <visionaray/material.h>
#include <visionaray/point_light.h>
#include <visionaray/scheduler.h>
#include <visionaray/simple_buffer_rt.h>

using namespace visionaray;

using triangle_t = basic_triangle<3, float>;
using sphere_t   = basic_sphere<float>;
using prim_t     = generic_primitive<triangle_t, sphere_t>;
using material_t = generic_material<
    emissive<float>, matte<float>, mirror<float>, plastic<float>>;

struct SceneData
{
    camera cam;
    vec4 bg{0.1f, 0.4f, 1.0f, 1.0f};
    vec4 ambient{0.0f, 0.0f, 0.0f, 0.0f};
    std::vector<point_light<float>> lights;
    std::vector<material_t> materials;
    std::vector<triangle_t> triangles;
    std::vector<sphere_t> spheres;
    int width = 0, height = 0;
};

static vec3 read3(std::istringstream& is)
{
    float x, y, z;
    is >> x >> y >> z;
    return vec3(x, y, z);
}

static bool load_scene(const char* path, SceneData& s, int w, int h)
{
    std::ifstream f(path);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path); return false; }
    s.width = w;
    s.height = h;
    std::string line;
    float fovy = 45.0f * constants::pi<float>() / 180.0f;
    vec3 eye(0, 0, 2), center(0, 0, 0), up(0, 1, 0);
    while (std::getline(f, line))
    {
        std::istringstream is(line);
        std::string key;
        is >> key;
        if (key == "camera")
        {
            eye = read3(is); center = read3(is); up = read3(is);
            is >> fovy;
        }
        else if (key == "bg")     { is >> s.bg.x >> s.bg.y >> s.bg.z >> s.bg.w; }
        else if (key == "ambient"){ is >> s.ambient.x >> s.ambient.y >> s.ambient.z >> s.ambient.w; }
        else if (key == "light")
        {
            point_light<float> l;
            l.set_position(read3(is));
            l.set_cl(read3(is));
            float kl, ac, al, aq;
            is >> kl >> ac >> al >> aq;
            l.set_kl(kl);
            l.set_constant_attenuation(ac);
            l.set_linear_attenuation(al);
            l.set_quadratic_attenuation(aq);
            s.lights.push_back(l);
        }
        else if (key == "mat")
        {
            std::string type;
            is >> type;
            vec3 ca = read3(is); float ka; is >> ka;
            vec3 cd = read3(is); float kd; is >> kd;
            vec3 cs = read3(is); float ks; is >> ks;
            float exp_; is >> exp_;
            vec3 cr = read3(is); float kr; is >> kr;
            vec3 ior = read3(is);
            vec3 abs_ = read3(is);
            vec3 ce = read3(is); float ls; is >> ls;
            if (type == "emissive")
            {
                emissive<float> m;
                m.set_ce(from_rgb(ce));
                m.set_ls(ls);
                s.materials.push_back(material_t(m));
            }
            else if (type == "matte")
            {
                matte<float> m;
                m.set_ca(from_rgb(ca)); m.set_ka(ka);
                m.set_cd(from_rgb(cd)); m.set_kd(kd);
                s.materials.push_back(material_t(m));
            }
            else if (type == "mirror")
            {
                mirror<float> m;
                m.set_cr(from_rgb(cr)); m.set_kr(kr);
                m.set_ior(from_rgb(ior));
                m.set_absorption(from_rgb(abs_));
                s.materials.push_back(material_t(m));
            }
            else
            {
                plastic<float> m;
                m.set_ca(from_rgb(ca)); m.set_ka(ka);
                m.set_cd(from_rgb(cd)); m.set_kd(kd);
                m.set_cs(from_rgb(cs)); m.set_ks(ks);
                m.set_specular_exp(exp_);
                s.materials.push_back(material_t(m));
            }
        }
        else if (key == "tri")
        {
            triangle_t t;
            t.v1 = read3(is);
            t.e1 = read3(is);
            t.e2 = read3(is);
            unsigned gid; is >> gid;
            t.prim_id = static_cast<unsigned>(s.triangles.size());
            t.geom_id = gid;
            s.triangles.push_back(t);
        }
        else if (key == "sphere")
        {
            sphere_t sp;
            sp.center = read3(is);
            float r; is >> r;
            unsigned gid; is >> gid;
            sp.radius = r;
            sp.geom_id = gid;
            s.spheres.push_back(sp);
        }
    }
    s.cam.set_viewport(0, 0, w, h);
    s.cam.perspective(fovy, w / static_cast<float>(h), 0.001f, 1000.0f);
    s.cam.look_at(eye, center, up);
    return true;
}

static void dump_raw(const char* path, const float* rgba, int w, int h)
{
    std::FILE* f = std::fopen(path, "wb");
    std::fwrite(&w, sizeof(int), 1, f);
    std::fwrite(&h, sizeof(int), 1, f);
    std::fwrite(rgba, sizeof(float), static_cast<size_t>(w) * h * 4, f);
    std::fclose(f);
}

// ---------------------------------------------------------------- parity
// Scalar simple_sched over mixed generic primitives (no BVH — the scenes
// are small and the primitive range IS the reference brute-force path).

template <typename Kernel, typename KParams>
static void run_parity(SceneData& s, const char* out, KParams kparams)
{
    Kernel kernel;
    kernel.params = kparams;
    simple_buffer_rt<PF_RGBA32F, PF_UNSPECIFIED> rt;
    rt.resize(s.width, s.height);
    simple_sched<basic_ray<float>> sched;
    auto sparams = make_sched_params(s.cam, rt);
    sched.frame(kernel, sparams);
    dump_raw(out, reinterpret_cast<const float*>(rt.color()),
             s.width, s.height);
}

static int parity_main(SceneData& s, const char* out, const char* algo,
                       unsigned bounces)
{
    std::vector<prim_t> prims;
    std::vector<vec3> normals;
    for (auto const& t : s.triangles)
    {
        prims.push_back(prim_t(t));
        normals.push_back(normalize(cross(t.e1, t.e2)));
    }
    for (auto sp : s.spheres)
    {
        // prim ids index the JOINT primitive range (spheres after tris) so
        // normals[hr.prim_id] stays in bounds; sphere normals come from
        // get_normal's center/radius path, the slot value is unused
        sp.prim_id = static_cast<unsigned>(prims.size());
        prims.push_back(prim_t(sp));
        normals.push_back(vec3(0.0f));
    }

    auto kparams = make_kernel_params(
        normals_per_face_binding{},
        prims.data(), prims.data() + prims.size(),
        normals.data(),
        s.materials.data(),
        s.lights.data(), s.lights.data() + s.lights.size(),
        bounces, 1e-4f, s.bg, s.ambient);

    if (std::strcmp(algo, "simple") == 0)
        run_parity<simple::kernel<decltype(kparams)>>(s, out, kparams);
    else
        run_parity<whitted::kernel<decltype(kparams)>>(s, out, kparams);
    return 0;
}

// ---------------------------------------------------------------- bench
// The reference's production CPU path: binned-SAH index_bvh + tiled_sched
// with SIMD ray packets + pathtracing kernel, jittered_blend accumulation.

static int bench_main(SceneData& s, unsigned bounces, int frames)
{
    using bvh_t = index_bvh<triangle_t>;
    std::vector<vec3> normals;
    normals.reserve(s.triangles.size());
    for (auto const& t : s.triangles)
        normals.push_back(normalize(cross(t.e1, t.e2)));

    std::fprintf(stderr, "loaded %zu tris\n", s.triangles.size());
    auto t_build0 = std::chrono::high_resolution_clock::now();
    auto bvh = build<bvh_t>(s.triangles.data(), s.triangles.size());
    auto t_build1 = std::chrono::high_resolution_clock::now();
    double build_s = std::chrono::duration<double>(t_build1 - t_build0).count();
    std::fprintf(stderr, "built bvh in %.2fs (%zu nodes)\n", build_s,
                 bvh.num_nodes());

    auto bvh_ref = bvh.ref();
    auto kparams = make_kernel_params(
        normals_per_face_binding{},
        &bvh_ref, &bvh_ref + 1,
        normals.data(),
        s.materials.data(),
        s.lights.data(), s.lights.data() + s.lights.size(),
        bounces, 1e-3f, s.bg, s.ambient);
    pathtracing::kernel<decltype(kparams)> kernel;
    kernel.params = kparams;

    simple_buffer_rt<PF_RGBA32F, PF_UNSPECIFIED> rt;
    rt.resize(s.width, s.height);
#if defined(__AVX2__)
    using ray_t = basic_ray<simd::float8>;
#else
    using ray_t = basic_ray<simd::float4>;
#endif
    unsigned nthreads = std::max(1u, std::thread::hardware_concurrency());
    tiled_sched<ray_t> sched(nthreads);
    // Upstream race workaround: tiled_sched workers wait on a condition
    // variable with NO predicate (detail/tiled_sched.inl:181), so a
    // frame() whose notify_all() beats a worker to its wait deadlocks the
    // whole pool (observed on this 2-core host).  Give the workers time
    // to park before the first frame.
    std::this_thread::sleep_for(std::chrono::milliseconds(500));

    unsigned frame_num = 0;
    // warm-up frame (thread pool spin-up, page faults)
    {
        auto sparams = make_sched_params(
            pixel_sampler::jittered_blend_type{}, s.cam, rt);
        sched.frame(kernel, sparams, ++frame_num);
    }
    auto t0 = std::chrono::high_resolution_clock::now();
    for (int i = 0; i < frames; ++i)
    {
        auto sparams = make_sched_params(
            pixel_sampler::jittered_blend_type{}, s.cam, rt);
        sched.frame(kernel, sparams, ++frame_num);
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double sec = std::chrono::duration<double>(t1 - t0).count() / frames;
    // ray accounting matches bench.py WITHOUT NEE: one closest-hit trace
    // per bounce per pixel (the reference kernel has no NEE/shadow rays)
    double rays = double(s.width) * s.height * bounces;
    std::printf(
        "{\"metric\": \"reference_cpu_pathtracing\", \"mrays_per_s\": %.4f, "
        "\"frame_s\": %.3f, \"build_s\": %.3f, \"threads\": %u, "
        "\"packet\": %d, \"tris\": %zu}\n",
        rays / sec / 1e6, sec, build_s, nthreads,
        (int)simd::num_elements<typename ray_t::scalar_type>::value,
        s.triangles.size());
    return 0;
}

int main(int argc, char** argv)
{
    if (argc < 3) { std::fprintf(stderr, "usage: see header\n"); return 2; }
    SceneData s;
    if (std::strcmp(argv[1], "parity") == 0)
    {
        if (argc < 8) { std::fprintf(stderr, "parity args\n"); return 2; }
        if (!load_scene(argv[2], s, std::atoi(argv[5]), std::atoi(argv[6])))
            return 1;
        return parity_main(s, argv[3], argv[4],
                           static_cast<unsigned>(std::atoi(argv[7])));
    }
    if (std::strcmp(argv[1], "bench") == 0)
    {
        if (argc < 7) { std::fprintf(stderr, "bench args\n"); return 2; }
        if (!load_scene(argv[2], s, std::atoi(argv[3]), std::atoi(argv[4])))
            return 1;
        return bench_main(s, static_cast<unsigned>(std::atoi(argv[5])),
                          std::atoi(argv[6]));
    }
    std::fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
