//! Async HTTP client (feature `client`).
//!
//! Same surface as the reference Rust client: `Client::new(url)` →
//! `.query()` → `.dynamic(request)` / `.stored(name)` → `.send()`,
//! with the engine-behavior header toggles.

use serde::de::DeserializeOwned;
use serde_json::Value;

use crate::dsl::DynamicQueryRequest;

/// Client error taxonomy.
#[derive(Debug)]
pub enum HelixError {
    Transport(reqwest::Error),
    Remote { status: u16, details: String },
    Usage(String),
}

impl std::fmt::Display for HelixError {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        match self {
            HelixError::Transport(e) => write!(f, "transport error: {e}"),
            HelixError::Remote { status, details } => {
                write!(f, "remote error ({status}): {details}")
            }
            HelixError::Usage(msg) => write!(f, "{msg}"),
        }
    }
}

impl std::error::Error for HelixError {}

impl From<reqwest::Error> for HelixError {
    fn from(e: reqwest::Error) -> Self {
        HelixError::Transport(e)
    }
}

/// Engine HTTP client bound to a base URL.
pub struct Client {
    url: String,
    api_key: Option<String>,
    http: reqwest::Client,
}

enum Route {
    Dynamic(Value),
    Stored(String, Value),
}

/// Route + header assembly; finish with `send()`.
pub struct QueryBuilder<'c> {
    client: &'c Client,
    headers: Vec<(&'static str, String)>,
    route: Option<Route>,
}

impl Client {
    pub fn new(url: impl Into<String>) -> Client {
        Client {
            url: url.into().trim_end_matches('/').to_string(),
            api_key: None,
            http: reqwest::Client::new(),
        }
    }

    pub fn with_api_key(mut self, key: impl Into<String>) -> Client {
        self.api_key = Some(key.into());
        self
    }

    pub fn query(&self) -> QueryBuilder<'_> {
        QueryBuilder {
            client: self,
            headers: Vec::new(),
            route: None,
        }
    }

    /// Install a queries.json bundle.
    pub async fn deploy_bundle<R: DeserializeOwned>(
        &self,
        bundle: &Value,
    ) -> Result<R, HelixError> {
        self.post("/v1/bundle", bundle, &[]).await
    }

    /// Engine liveness stats.
    pub async fn health<R: DeserializeOwned>(&self) -> Result<R, HelixError> {
        let mut req = self.http.get(format!("{}/v1/health", self.url));
        if let Some(key) = &self.api_key {
            req = req.bearer_auth(key);
        }
        decode(req.send().await?).await
    }

    async fn post<R: DeserializeOwned>(
        &self,
        route: &str,
        body: &Value,
        headers: &[(&str, String)],
    ) -> Result<R, HelixError> {
        let mut req = self
            .http
            .post(format!("{}{}", self.url, route))
            .json(body);
        if let Some(key) = &self.api_key {
            req = req.bearer_auth(key);
        }
        for (name, value) in headers {
            req = req.header(*name, value);
        }
        decode(req.send().await?).await
    }
}

async fn decode<R: DeserializeOwned>(resp: reqwest::Response) -> Result<R, HelixError> {
    let status = resp.status();
    if status.is_success() {
        Ok(resp.json::<R>().await?)
    } else {
        let details = resp.text().await.unwrap_or_default();
        Err(HelixError::Remote {
            status: status.as_u16(),
            details,
        })
    }
}

impl<'c> QueryBuilder<'c> {
    /// Require a writer node (`x-helix-require-writer`).
    pub fn writer_only(mut self) -> Self {
        self.headers.push(("x-helix-require-writer", "true".into()));
        self
    }
    /// Serve only if warm; reads only (`x-helix-warm`).
    pub fn warm_only(mut self) -> Self {
        self.headers.push(("x-helix-warm", "true".into()));
        self
    }
    /// Control write durability acknowledgment (`x-helix-await-durable`).
    pub fn should_await_durability(mut self, should: bool) -> Self {
        self.headers
            .push(("x-helix-await-durable", should.to_string()));
        self
    }
    /// Request per-step timings (`x-helix-trace`).
    pub fn trace(mut self) -> Self {
        self.headers.push(("x-helix-trace", "true".into()));
        self
    }

    /// Target the dynamic route with a request envelope.
    pub fn dynamic(mut self, request: &DynamicQueryRequest) -> Self {
        self.route = Some(Route::Dynamic(request.encode()));
        self
    }
    /// Target a deployed stored route with bare parameters.
    pub fn stored(mut self, name: impl Into<String>, parameters: Value) -> Self {
        self.route = Some(Route::Stored(name.into(), parameters));
        self
    }

    /// Send and deserialize the response.
    pub async fn send<R: DeserializeOwned>(self) -> Result<R, HelixError> {
        match self.route {
            Some(Route::Dynamic(body)) => {
                self.client.post("/v1/query", &body, &self.headers).await
            }
            Some(Route::Stored(name, params)) => {
                self.client
                    .post(&format!("/v1/query/{name}"), &params, &self.headers)
                    .await
            }
            None => Err(HelixError::Usage(
                "choose dynamic() or stored() before send()".into(),
            )),
        }
    }
}
