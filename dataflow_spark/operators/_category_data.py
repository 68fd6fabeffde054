"""The reference's math-category taxonomy (data, not code — reference
dataflow/utils/reasoning/CategoryFuzz.py:6-58, the label sets its
ReasoningQuestionCategorySampleEvaluator normalizes into)."""

PRIMARY_CATEGORIES = [
    "Foundations and Logic",
    "Algebra and Number Theory",
    "Analysis and Differential Equations",
    "Geometry and Topology",
    "Probability, Statistics, and Discrete Mathematics",
    "Applied and Computational Mathematics",
    "Arithmetic",
]

SECONDARY_CATEGORIES = {
    "Foundations and Logic": [
        "Mathematical Logic and Set Theory",
        "Basic Theory, Formalization, and History & Education",
    ],
    "Algebra and Number Theory": [
        "Linear Algebra and Group Theory",
        "Ring Theory, Field Theory, and Polynomial Algebra",
        "Commutative Algebra and Homological/Categorical Methods",
        "Number Theory",
        "Algebraic Geometry",
    ],
    "Analysis and Differential Equations": [
        "Real Analysis, Measure Theory, and Functional Analysis",
        "Complex Analysis and Special Functions",
        "Differential Equations and Dynamical Systems",
        "Integral Transforms, Integral Equations, and Difference Equations",
        "Harmonic Analysis",
    ],
    "Geometry and Topology": [
        "Euclidean, Analytic, and Convex/Discrete Geometry",
        "Differential Geometry and Manifold Theory",
        "Topology and Algebraic Topology",
    ],
    "Probability, Statistics, and Discrete Mathematics": [
        "Probability Theory and Stochastic Processes",
        "Mathematical Statistics",
        "Combinatorics and Graph Theory",
    ],
    "Applied and Computational Mathematics": [
        "Numerical Analysis and Computational Methods",
        "Optimal Control, Variational Methods, and Optimization",
        "Operations Research and Game Theory",
        "Systems Theory and Control",
        "Computer Science and Algorithms",
        "Mathematical Physics and Engineering Mathematics",
        "Information and Communication",
        "Bimathematics",
    ],
    "Arithmetic": [
        "Basic Arithmetic and Number Operations",
        "Word Problems and Real-Life Applications",
    ],
}
